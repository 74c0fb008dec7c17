from . import ann, dedup, lines, multimodal, textstats
