"""Host-side union-find (disjoint set) shared by the merge finishers.

One implementation of path-halving find + union for the host-side
post-processing passes (mean-shift region merge, FH04 graph
segmentation, line-segment connection) that previously each carried
their own copy; the device-side analog is the label-propagation fixpoint
in ip.binary, and the native analog lives in native/ccl.cpp.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    """Array-backed disjoint sets over ids ``0..n-1``."""

    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, a: int) -> int:
        p = self.parent
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return a

    def union(self, a: int, b: int) -> int:
        """Merge the sets of ``a`` and ``b``; returns the surviving root."""
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra
        return ra

    def roots(self) -> np.ndarray:
        """[n] root id per element."""
        return np.array([self.find(i) for i in range(len(self.parent))])

    def labels(self) -> np.ndarray:
        """[n] compact 0-based labels (one per set)."""
        _, lab = np.unique(self.roots(), return_inverse=True)
        return lab
