from .assortativity import degree_assortativity
from .bfs import shortest_hops
from .centrality import closeness_centrality, multi_source_hops
from .cc import cc_labels
from .pagerank import pagerank_mass
from .sssp import shortest_paths
from .triangles import clustering_coefficients, triangle_counts

__all__ = ["cc_labels", "clustering_coefficients", "degree_assortativity",
           "pagerank_mass", "shortest_hops", "shortest_paths",
           "triangle_counts"]
