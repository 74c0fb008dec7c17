from .assortativity import degree_assortativity
from .bfs import shortest_hops
from .centrality import (closeness_centrality, harmonic_centrality,
                         multi_source_hops)
from .cc import cc_labels
from .pagerank import pagerank_mass
from .sssp import shortest_paths
from .structure import reciprocity, rich_club
from .triangles import clustering_coefficients, triangle_counts

__all__ = ["cc_labels", "closeness_centrality", "clustering_coefficients",
           "degree_assortativity", "harmonic_centrality", "multi_source_hops",
           "pagerank_mass", "reciprocity", "rich_club",
           "shortest_hops", "shortest_paths", "triangle_counts"]
