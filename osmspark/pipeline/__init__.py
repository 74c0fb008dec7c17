from . import ann, dedup, lines, multimodal, repetition, textstats
