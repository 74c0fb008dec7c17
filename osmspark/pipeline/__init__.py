from . import (ann, dedup, lines, membership, multimodal, quality,
               repetition, textstats)
