"""Image-text retrieval scoring (reference minigpt4/models/blip2.py:128-241
``compute_sim_matrix``) — the LAVIS retrieval-eval helper on Blip2Base.

Computes the two-stage similarity matrices: a cheap dot-product sweep over
all pairs, then ITM re-ranking of each row's top-k.  The reference shards
rows across ranks and all_reduces full tensors (blip2.py:225-236); here
rows are sharded across hosts and combined with one array all-gather + max
(rows a host didn't score stay at the -100 floor, so elementwise max is
exactly the reference's reduce).

Note: like the reference (where ``compute_sim_matrix`` is a LAVIS vestige
with no caller in the Myriad tree), this helper has no production caller —
it is kept for API parity and exercised by tests/test_protocols.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from myriad_tpu.common import dist


def compute_sim_matrix(
    image_embeds: jnp.ndarray,  # (N_img, Q, D) query-level embeddings
    text_embeds: jnp.ndarray,  # (N_txt, D)
    itm_score_fn: Optional[Callable] = None,  # (img_idx, txt_indices) -> (k,)
    k_test: int = 128,
):
    """Returns (score_i2t (N_img, N_txt), score_t2i (N_txt, N_img))."""
    image_embeds = jnp.asarray(image_embeds)
    text_embeds = jnp.asarray(text_embeds)
    # stage 1: max over query tokens of q . t (blip2.py:178-183)
    sims = jnp.einsum("iqd,td->iqt", image_embeds, text_embeds).max(axis=1)
    sims = np.asarray(sims)
    n_img, n_txt = sims.shape
    k = min(k_test, n_txt)

    score_i2t = np.full((n_img, n_txt), -100.0, np.float32)
    score_t2i = np.full((n_txt, n_img), -100.0, np.float32)

    rank, world = dist.get_rank(), dist.get_world_size()
    step = n_img // world + 1
    for i in range(rank * step, min(n_img, (rank + 1) * step)):
        topk = np.argsort(-sims[i])[:k]
        rerank = (
            np.asarray(itm_score_fn(i, topk)) if itm_score_fn is not None else 0.0
        )
        score_i2t[i, topk] = sims[i, topk] + rerank

    sims_t = sims.T
    k_i = min(k_test, n_img)
    step = n_txt // world + 1
    for t in range(rank * step, min(n_txt, (rank + 1) * step)):
        topk = np.argsort(-sims_t[t])[:k_i]
        rerank = (
            np.asarray(itm_score_fn(topk, t)) if itm_score_fn is not None else 0.0
        )
        score_t2i[t, topk] = sims_t[t, topk] + rerank

    if world > 1:
        from jax.experimental import multihost_utils

        # every host fills only its row shard; unscored rows stay at the
        # -100 floor, so a single all-gather + elementwise max reassembles
        # the full matrices without python-scalar round-trips
        gathered = multihost_utils.process_allgather(
            np.stack([score_i2t, score_t2i.T])
        )  # (world, 2, N_img, N_txt)
        score_i2t = np.max(gathered[:, 0], axis=0)
        score_t2i = np.max(gathered[:, 1], axis=0).T
    return score_i2t, score_t2i
