"""Draft models for speculative decoding.

Capability parity with the reference draft stack
(reference: src/superconductor/models/ngram_draft.py:1139 ``HybridDraft`` =
formula-grammar FSM + n-gram statistics with backoff, pickled to disk; and
speculative_decoder.py:122).

TPU redesign: the reference chains Python dict lookups per draft token; here
the whole n-gram model is two dense device arrays so chained drafting of k
tokens is k gathers inside the generation scan — no host calls:

  * ``trigram [V, V] int16`` — argmax successor of (prev, cur), -1 if the
    context pair was never observed (backoff signal)
  * ``bigram  [V]    int32`` — argmax successor of cur (backoff order 1)

Both tables are grammar-constrained at build time by the token-type
transition FSM (the reference's "structural draft", ngram_draft.py:1336),
so an illegal successor is never drafted.  Build once from the training
token arrays, save as .npz.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

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


def build_ngram_draft(tokens: np.ndarray,
                      tokenizer: FractionAwareTokenizer,
                      grammar_constrained: bool = True
                      ) -> Dict[str, np.ndarray]:
    """Build the full backoff draft: trigram [V, V] over bigram [V].

    The trigram table holds, for every observed (prev, cur) context pair,
    the most frequent grammar-legal successor; -1 marks unseen contexts
    (draft falls back to the bigram).  Dense [V, V] int16 is ~43 MB at
    V=4752 — a single HBM-resident gather per draft token, vs the
    reference's per-token Python dict chain (ngram_draft.py:1139-1521).
    """
    v = tokenizer.vocab_size
    types = tokenizer.token_type_table

    bigram = build_bigram_draft(tokens, tokenizer,
                                grammar_constrained=grammar_constrained)

    prev = tokens[:, :-2].reshape(-1)
    cur = tokens[:, 1:-1].reshape(-1)
    nxt = tokens[:, 2:].reshape(-1)
    keep = (prev != PAD_ID) & (cur != PAD_ID) & (nxt != PAD_ID)
    prev, cur, nxt = prev[keep], cur[keep], nxt[keep]
    if grammar_constrained:
        legal = np.zeros((5, 5), bool)
        for t, allowed in _ALLOWED.items():
            legal[t, list(allowed)] = True
        ok = legal[types[cur], types[nxt]]
        prev, cur, nxt = prev[ok], cur[ok], nxt[ok]

    trigram = np.full((v, v), -1, np.int16)
    # group by context key = prev * V + cur; argmax successor per group
    key = prev.astype(np.int64) * v + cur.astype(np.int64)
    order = np.argsort(key, kind='stable')
    key_s, nxt_s = key[order], nxt[order]
    starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
    ends = np.r_[starts[1:], len(key_s)]
    for lo, hi in zip(starts, ends):
        succ = nxt_s[lo:hi]
        vals, cnts = np.unique(succ, return_counts=True)
        k = key_s[lo]
        trigram[k // v, k % v] = vals[np.argmax(cnts)]
    return {'bigram': bigram, 'trigram': trigram}


def save_draft(path: str | Path, table) -> None:
    if isinstance(table, dict):
        np.savez_compressed(path, **table)
    else:
        np.savez_compressed(path, table=table)


def load_draft(path: str | Path) -> Optional[np.ndarray]:
    path = Path(path)
    if not path.exists():
        return None
    with np.load(path) as z:
        if 'trigram' in z:
            return {'bigram': z['bigram'], 'trigram': z['trigram']}
        return z['table']
