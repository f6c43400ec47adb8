"""Multi-host execution (SURVEY.md §5.8).

Design: hosts are peers in a jax.distributed job. The phase-gap index is
computed identically on every host from the same VCF (replicated, no
communication needed); gaps are assigned to hosts by a deterministic
round-robin over the global gap list (the gap — not the read — is the unit
of distribution, so no duplicate-read hazards). Each host loads only its own
gaps' BAM windows (BAI random access), runs the batched device engine on its
local chips, and the per-gap decisions + read tags are merged with a
jax.experimental.multihost_utils all-gather; the block-union
(lift_decisions) then runs replicated on every host, so host 0's output is
identical to a single-host run.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize from args or env
    (POMFRET_COORDINATOR / POMFRET_NUM_PROCS / POMFRET_PROC_ID)."""
    coordinator = coordinator or os.environ.get("POMFRET_COORDINATOR")
    if coordinator is None:
        return  # single-host
    num_processes = num_processes or int(os.environ["POMFRET_NUM_PROCS"])
    process_id = process_id if process_id is not None else int(os.environ["POMFRET_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def assign_gaps(n_gaps: int, num_processes: int, process_id: int) -> List[int]:
    """Deterministic round-robin gap assignment (same on every host)."""
    return [i for i in range(n_gaps) if i % num_processes == process_id]


def allgather_decisions(local: Dict[int, int], n_gaps: int) -> np.ndarray:
    """All-gather per-gap decisions across hosts.

    local: {global gap index: decision} computed by this host. Returns the
    (n_gaps,) global decision vector, identical on every host. Uses a dense
    max-reduction (decisions are >= -1; unassigned slots carry -2).
    """
    vec = np.full(n_gaps, -2, dtype=np.int32)
    for i, d in local.items():
        vec[i] = d
    if jax.process_count() == 1:
        out = vec
    else:
        from jax.experimental import multihost_utils
        gathered = multihost_utils.process_allgather(vec)  # (P, n_gaps)
        out = gathered.max(axis=0).astype(np.int32)
    # unassigned -> no-join (should not happen when assignment covers all)
    out[out == -2] = -1
    return out


def allgather_tag_maps(local: Dict[str, int]) -> Dict[str, int]:
    """All-gather qname->haptag maps; first process wins on conflicts
    (matches the reference's first-wins merge, blockjoin.c:4579-4595)."""
    if jax.process_count() == 1:
        return dict(local)
    import json
    from jax.experimental import multihost_utils
    blob = json.dumps(local).encode()
    arr = np.frombuffer(blob, dtype=np.uint8)
    # pad to the max length across hosts
    n = np.array([len(arr)], dtype=np.int32)
    lens = multihost_utils.process_allgather(n).ravel()
    mx = int(lens.max())
    pad = np.zeros(mx, dtype=np.uint8)
    pad[: len(arr)] = arr
    all_blobs = multihost_utils.process_allgather(pad)  # (P, mx)
    merged: Dict[str, int] = {}
    for p in range(all_blobs.shape[0]):
        m = json.loads(bytes(all_blobs[p, : int(lens[p])]).decode())
        for k, v in m.items():
            merged.setdefault(k, v)
    return merged
