"""Graph batching into the padded flat-node space of the RGCN adapter.

The reference batches ragged graphs with PyG `Batch.from_data_list`
(dataloader.py:103-110) and the RGCN runs on the flat concatenated node set
(modeling_esm2rgcn2llama_instruct.py:217).  TPU version: nodes stay in the
padded (B, S) token grid — residue i of protein b lives at flat index
b*S + (i+1) (the +1 skips the bos token, matching the node-mask semantics of
adapters.node_mask_from_attention / reference :208-214) — and edges are
padded to a fixed budget with an edge_mask.  Fixed shapes ⇒ one jit.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def collate_graphs(
    graphs: Sequence[Dict[str, np.ndarray]],   # each {edge_index, edge_type}
    seq_len: int,                              # padded protein token length S
    edge_budget: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Returns {edge_index (2, E), edge_type (E,), edge_mask (E,)} in flat
    (B*S) node space.  Edges whose endpoints fall outside the padded residue
    range are dropped (mirrors sequence trimming)."""
    eis, ets = [], []
    for b, g in enumerate(graphs):
        ei = np.asarray(g["edge_index"])
        et = np.asarray(g["edge_type"])
        if ei.size == 0:
            continue
        # residues usable: 0..seq_len-3 (bos + residues + eos fit in S)
        keep = (ei < seq_len - 2).all(axis=0)
        ei = ei[:, keep]
        et = et[keep]
        eis.append(b * seq_len + ei + 1)   # +1: skip bos position
        ets.append(et)
    if eis:
        ei = np.concatenate(eis, axis=1)
        et = np.concatenate(ets)
    else:
        ei = np.zeros((2, 0), np.int64)
        et = np.zeros((0,), np.int64)
    E = ei.shape[1]
    budget = edge_budget if edge_budget is not None else max(E, 1)
    if E > budget:
        ei = ei[:, :budget]
        et = et[:budget]
        E = budget
    out_ei = np.zeros((2, budget), np.int32)
    out_et = np.zeros((budget,), np.int32)
    out_em = np.zeros((budget,), np.int32)
    out_ei[:, :E] = ei
    out_et[:E] = et
    out_em[:E] = 1
    return {"edge_index": out_ei, "edge_type": out_et, "edge_mask": out_em}
