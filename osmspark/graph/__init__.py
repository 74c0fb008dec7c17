from .cc import cc_labels

__all__ = ["cc_labels"]
