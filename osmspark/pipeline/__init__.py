from . import (ann, dedup, lines, lm, membership, multimodal,
               quality, repetition, textstats)
