"""Structural weight migration between differently-shaped models.

Parity with reference ``scripts/training/utils.py`` copy_model_variables
(:178-348) + lcs (:154-175): when an architecture grows/shrinks (e.g.
progressive growing adds res blocks), weights are migrated by walking
both models' variables in order and aligning them with a longest-common-
subsequence match on (variable name, shape) -- unmatched destination
variables keep their initialization.

Used by the registry's ``copy_variables`` config key.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import numpy as np


def lcs(a: List[Any], b: List[Any], key=lambda x: x) -> List[Tuple[int,
                                                                   int]]:
    """Longest common subsequence; returns matched index pairs."""
    ka = [key(x) for x in a]
    kb = [key(x) for x in b]
    n, m = len(a), len(b)
    table = np.zeros((n + 1, m + 1), np.int32)
    for i in range(n - 1, -1, -1):
        for j in range(m - 1, -1, -1):
            if ka[i] == kb[j]:
                table[i, j] = table[i + 1, j + 1] + 1
            else:
                table[i, j] = max(table[i + 1, j], table[i, j + 1])
    pairs = []
    i = j = 0
    while i < n and j < m:
        if ka[i] == kb[j]:
            pairs.append((i, j))
            i += 1
            j += 1
        elif table[i + 1, j] >= table[i, j + 1]:
            i += 1
        else:
            j += 1
    return pairs


def _ordered_leaves(tree, prefix=""):
    """(path, leaf) pairs in deterministic tree order, skipping _meta."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == "_meta":
                continue
            out.extend(_ordered_leaves(v, f"{prefix}.{k}" if prefix
                                       else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.extend(_ordered_leaves(v, f"{prefix}.{i}" if prefix
                                       else str(i)))
    else:
        out.append((prefix, tree))
    return out


def copy_model_variables(dst_tree, src_tree, verbose: bool = False):
    """Structurally migrate matching variables from src into dst.

    Variables are matched by LCS over (leaf name, shape): depth changes
    shift block indices, so the *full* path is ignored and only the
    final component (kernel/gamma/...) plus shape participates --
    ordering does the rest, exactly like the reference's saveable walk.
    Returns a new tree shaped like ``dst_tree``.
    """
    dst_leaves = _ordered_leaves(dst_tree)
    src_leaves = _ordered_leaves(src_tree)

    def sig(item):
        path, leaf = item
        return (path.rsplit(".", 1)[-1], tuple(np.shape(leaf)))

    pairs = lcs(dst_leaves, src_leaves, key=sig)
    replacements = {
        dst_leaves[i][0]: src_leaves[j][1] for i, j in pairs
    }
    if verbose:
        print(f"copy_model_variables: matched {len(pairs)}/"
              f"{len(dst_leaves)} destination variables")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: (v if k == "_meta" else rebuild(
                    v, f"{prefix}.{k}" if prefix else str(k)))
                for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [
                rebuild(v, f"{prefix}.{i}" if prefix else str(i))
                for i, v in enumerate(tree)
            ]
        if isinstance(tree, tuple):
            return tuple(
                rebuild(v, f"{prefix}.{i}" if prefix else str(i))
                for i, v in enumerate(tree)
            )
        return replacements.get(prefix, tree)

    return rebuild(dst_tree)
