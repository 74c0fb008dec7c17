from .cc import cc_labels
from .pagerank import pagerank_mass

__all__ = ["cc_labels", "pagerank_mass"]
