from . import ann, dedup, multimodal, textstats
