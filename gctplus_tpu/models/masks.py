"""Boolean attention-mask builders.

Semantics replicate the reference mask builders (GCT-Plus
Model/modules.py:17-66) including the condition-block quirks:

- src mask: padding mask (bs, 1, nc + L) with an all-ones condition
  prefix when conditions are present.
- trg mask: padding mask AND a causal no-peek mask; with
  `use_cond2dec` the no-peek mask grows a condition block whose
  upper-right region is masked except column 0 (modules.py:20-26).

Masks are boolean; True = attend. Inside attention they select
between the score and -1e9 (masked_fill parity, not additive bias).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def nopeak_mask(trg_size: int, use_cond2dec: bool = False, cond_dim: int = 0):
    """(1, T, T) (or (1, nc+T, nc+T)) boolean causal mask.

    Parity: Model/modules.py:17-30. The reference multiplies the
    boolean mask by pad_idx; with torchtext vocabs pad_idx == 1, so
    that is the identity and we drop it.
    """
    m = np.triu(np.ones((1, trg_size, trg_size), dtype=np.uint8), k=1) == 0
    if use_cond2dec and cond_dim > 0:
        cond_block = np.zeros((1, cond_dim, cond_dim), dtype=np.uint8)
        upper_right = np.ones((1, cond_dim, trg_size), dtype=np.uint8)
        upper_right[:, :, 0] = 0  # quirk kept from modules.py:22
        lower_left = np.zeros((1, trg_size, cond_dim), dtype=np.uint8)
        upper = np.concatenate([cond_block, upper_right], axis=2)
        lower = np.concatenate([lower_left.astype(np.uint8), (~m).astype(np.uint8)], axis=2)
        m = np.concatenate([upper, lower], axis=1) == 0
    return jnp.asarray(m)


def get_src_mask(src, pad_id: int, conds=None):
    """(bs, 1, [nc +] L) boolean padding mask. Parity: modules.py:38-44."""
    mask = (src != pad_id)[:, None, :]
    if conds is not None:
        cond_mask = jnp.ones((src.shape[0], 1, conds.shape[-1]), dtype=bool)
        mask = jnp.concatenate([cond_mask, mask], axis=2)
    return mask


def get_trg_mask(trg, pad_id: int, use_cond2dec: bool, conds=None):
    """(bs, [nc +] T, [nc +] T) boolean mask. Parity: modules.py:47-58."""
    pad_mask = (trg != pad_id)[:, None, :]
    if use_cond2dec and conds is not None:
        cond_mask = jnp.ones((trg.shape[0], 1, conds.shape[-1]), dtype=bool)
        pad_mask = jnp.concatenate([cond_mask, pad_mask], axis=2)
    cond_dim = 0 if conds is None else conds.shape[-1]
    np_mask = nopeak_mask(trg.shape[1], use_cond2dec, cond_dim)
    return pad_mask & np_mask
