from .cc import cc_labels
from .pagerank import pagerank_mass
from .triangles import triangle_counts

__all__ = ["cc_labels", "pagerank_mass", "triangle_counts"]
