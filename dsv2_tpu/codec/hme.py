"""Hierarchical motion estimation — entry point (see ops/hme_search.py).

(ref: src/hme.c)
"""


def motion_est(enc, d):
    from ..ops import hme_search
    hme_search.motion_est(enc, d)
