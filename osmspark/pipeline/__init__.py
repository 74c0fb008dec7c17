from . import (ann, dedup, lines, lm, membership, multimodal,
               quality, repetition, semdedup, textstats, winnow)
