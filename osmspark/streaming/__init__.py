from .source import (stream_nodes, stream_pages, stream_tile_counts,
                     stream_windowed_tile_counts)
