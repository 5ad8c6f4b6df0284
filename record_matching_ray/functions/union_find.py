"""Driver-side union-find (path compression + union by size).

The reference clusters with scipy.cluster.hierarchy.DisjointSet on the
driver (record_matching/main.py:629-651). scipy is not available here, and
the scale path is the distributed label propagation in
stages/clustering.py — this class exists as (a) the oracle tests compare
the distributed result against, and (b) a fast path for provably-small edge
sets (e.g. within one refinement group).
"""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict = {}
        self.size: dict = {}

    def add(self, x) -> None:
        if x not in self.parent:
            self.parent[x] = x
            self.size[x] = 1

    def find(self, x):
        self.add(x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def components(self) -> dict:
        """node -> min element of its component (deterministic cluster id)."""
        groups: dict = {}
        for x in self.parent:
            groups.setdefault(self.find(x), []).append(x)
        out = {}
        for members in groups.values():
            label = min(members)
            for m in members:
                out[m] = label
        return out
