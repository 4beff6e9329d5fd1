"""Draft models for speculative decoding.

Capability parity with the reference draft stack
(reference: src/superconductor/models/ngram_draft.py:1139 ``HybridDraft`` =
formula-grammar FSM + n-gram statistics, pickled to disk; and
speculative_decoder.py:122).

TPU redesign: the draft is a dense ``[V]`` next-token LUT (bigram argmax,
optionally grammar-constrained by the token-type transition FSM), so chained
drafting of k tokens is k gathers inside the generation scan — no host
calls.  Build once from the training token arrays, save as .npz.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..tokenizer import (
    FractionAwareTokenizer, EOS_ID, PAD_ID,
    TOKEN_TYPE_ELEMENT, TOKEN_TYPE_INTEGER, TOKEN_TYPE_FRACTION,
    TOKEN_TYPE_SPECIAL, TOKEN_TYPE_EOS,
)

# formula grammar FSM: allowed successor TYPES per type
# element -> element | integer | fraction | EOS
# integer -> element | EOS ; fraction -> element | EOS
# special(BOS/iso) -> element | integer | fraction ; EOS -> EOS
_ALLOWED = {
    TOKEN_TYPE_ELEMENT: (TOKEN_TYPE_ELEMENT, TOKEN_TYPE_INTEGER,
                         TOKEN_TYPE_FRACTION, TOKEN_TYPE_EOS),
    TOKEN_TYPE_INTEGER: (TOKEN_TYPE_ELEMENT, TOKEN_TYPE_EOS),
    TOKEN_TYPE_FRACTION: (TOKEN_TYPE_ELEMENT, TOKEN_TYPE_EOS),
    TOKEN_TYPE_SPECIAL: (TOKEN_TYPE_ELEMENT, TOKEN_TYPE_INTEGER,
                         TOKEN_TYPE_FRACTION, TOKEN_TYPE_SPECIAL),
    TOKEN_TYPE_EOS: (TOKEN_TYPE_EOS,),
}


def build_bigram_draft(tokens: np.ndarray,
                       tokenizer: FractionAwareTokenizer,
                       grammar_constrained: bool = True) -> np.ndarray:
    """[N, T] training token arrays -> ``[V]`` next-token draft LUT.

    For each token id, the most frequent grammar-legal successor observed in
    the corpus; EOS where nothing was observed.
    """
    v = tokenizer.vocab_size
    types = tokenizer.token_type_table

    cur = tokens[:, :-1].reshape(-1)
    nxt = tokens[:, 1:].reshape(-1)
    keep = (cur != PAD_ID) & (nxt != PAD_ID)
    cur, nxt = cur[keep], nxt[keep]

    counts = np.zeros((v,), np.int64)
    table = np.full(v, EOS_ID, np.int32)
    # group by current token; argmax successor
    order = np.argsort(cur, kind='stable')
    cur_s, nxt_s = cur[order], nxt[order]
    boundaries = np.searchsorted(cur_s, np.arange(v + 1))
    for t in np.unique(cur_s):
        lo, hi = boundaries[t], boundaries[t + 1]
        succ = nxt_s[lo:hi]
        if grammar_constrained:
            legal = np.isin(types[succ], _ALLOWED[int(types[t])])
            succ = succ[legal]
        if len(succ):
            vals, cnts = np.unique(succ, return_counts=True)
            table[t] = vals[np.argmax(cnts)]
            counts[t] = cnts.max()
    return table


def save_draft(path: str | Path, table: np.ndarray) -> None:
    np.savez_compressed(path, table=table)


def load_draft(path: str | Path) -> Optional[np.ndarray]:
    path = Path(path)
    if not path.exists():
        return None
    return np.load(path)['table']
