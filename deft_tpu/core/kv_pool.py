"""Host-side token-granularity KV slot allocator with prefix-sharing refcounts.

Capability parity with the reference TokenToKVPool
(/root/reference/DeFT/deft/memory_pool.py:48-108), redesigned for TPU/JAX:

- The reference couples allocation with per-layer ``kv_data`` torch tensors
  mutated in place.  In JAX the device KV arrays are functional state owned by
  the model runner (donated through the jitted step); this class manages only
  the slot accounting on host.
- The reference's ``alloc`` does an O(pool) ``nonzero`` scan per step.  Here a
  bump pointer serves never-used slots first (keeping early allocations —
  notably the prompt — contiguous for coalesced TPU gathers), with freed slots
  recycled from a stack.
- Slot 0 is reserved as a scratch/"dump" slot so padded lanes in the jitted
  step can scatter garbage without corrupting live KV (the TPU analog of the
  reference's ``other_kv_index`` NaN guard, model_runner.py:116-123).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

DUMP_SLOT = 0


class TokenKVPool:
    def __init__(self, size: int):
        assert size > 1
        self.size = size
        self.refs = np.zeros(size, dtype=np.int32)
        # Slot 0 reserved (see module docstring); never allocated.
        self._bump = 1
        self._recycled: list[int] = []
        self._free_count = size - 1

    # -- queries -------------------------------------------------------------
    def available_size(self) -> int:
        return self._free_count

    def used_size(self) -> int:
        return self.size - 1 - self._free_count

    # -- alloc / free ----------------------------------------------------------
    def alloc(self, need_size: int) -> Optional[np.ndarray]:
        """Allocate ``need_size`` slots (refcount 1 each); None if exhausted."""
        if need_size > self._free_count:
            return None
        out = np.empty(need_size, dtype=np.int32)
        n_bump = min(need_size, self.size - self._bump)
        if n_bump > 0:
            out[:n_bump] = np.arange(self._bump, self._bump + n_bump, dtype=np.int32)
            self._bump += n_bump
        if n_bump < need_size:
            n_rec = need_size - n_bump
            out[n_bump:] = self._recycled[-n_rec:][::-1]
            del self._recycled[-n_rec:]
        self.refs[out] = 1
        self._free_count -= need_size
        return out

    def add_refs(self, indices: np.ndarray) -> None:
        """Increment refcounts (prefix sharing across branches)."""
        np.add.at(self.refs, np.asarray(indices, dtype=np.int64), 1)

    def decrease_refs(self, indices: np.ndarray) -> None:
        indices = np.asarray(indices, dtype=np.int64)
        np.add.at(self.refs, indices, -1)
        dead = indices[self.refs[indices] == 0]
        if len(dead):
            assert np.all(self.refs[dead] == 0)
            self._recycled.extend(int(i) for i in dead)
            self._free_count += len(dead)

    # Reference naming: free == decrement refs, releasing slots at zero
    # (memory_pool.py:76-88).
    free = decrease_refs

    def clear(self) -> None:
        self.refs[:] = 0
        self._bump = 1
        self._recycled.clear()
        self._free_count = self.size - 1
