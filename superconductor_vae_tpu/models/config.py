"""Model architecture configuration.

Defaults reproduce the reference V12.43/V14.3 architecture
(reference: scripts/train_v12_clean.py:351-364 MODEL_CONFIG): 108M params,
latent 2048, d_model 576 / 12 layers / ffn 2304, 24 memory tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # latent + encoder
    latent_dim: int = 2048
    fusion_dim: int = 288
    magpie_dim: int = 145
    encoder_hidden: Tuple[int, ...] = (576, 288)
    decoder_hidden: Tuple[int, ...] = (288, 576)
    element_embed_dim: int = 128
    n_attention_heads: int = 8
    max_elements: int = 12
    n_elements: int = 118
    use_numden_head: bool = False

    # formula decoder
    vocab_size: int = 4752
    d_model: int = 576
    nhead: int = 8
    num_layers: int = 12
    dim_feedforward: int = 2304
    max_len: int = 30
    n_memory_tokens: int = 16
    n_stoich_tokens: int = 4
    n_heads_tokens: int = 4
    heads_input_dim: int = 24       # tc(1)+sc(1)+hp(1)+tc_class(5)+comp(1)+count(1)+family(14)
    stoich_input_dim: int = 13      # fractions(12) + count(1), V13 layout
    memory_bottleneck_dim: int = 0  # 0 = direct MLP (V12.41-compat); >0 = V15 bottleneck

    # Positional-table base dim for width-expanded models: after
    # surgery.expand_decoder_width the widened model keeps the ORIGINAL
    # model's sinusoidal table, channel-duplicated with the same per-head
    # map as the residual stream, so expansion is exactly
    # function-preserving (recomputing sinusoids at the new d_model is
    # not: PE is O(1) per channel and re-randomizes the stream).
    # None = table is plain sinusoidal at d_model (un-expanded models).
    pos_dim: int | None = None

    dropout: float = 0.1

    # Decode-time attention backend for the AR generation scan: when True,
    # DecoderLayer.step runs the fused Pallas cache-update+attention kernel
    # (ops/pallas_decode.py) and the KV cache lives in the kernel's
    # [B, H, T, Dh] layout; when False (default), the XLA
    # dynamic_update_slice + masked-softmax path.  Parameter-free toggle:
    # the same checkpoint params evaluate under either backend
    # (dataclasses.replace(mcfg, pallas_decode=True)).  Speculative
    # decode_chunk requires the XLA layout.
    pallas_decode: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.nhead

    @property
    def n_total_memory_tokens(self) -> int:
        return self.n_memory_tokens + self.n_stoich_tokens + self.n_heads_tokens


def tiny_test_config() -> ModelConfig:
    """Small config for CPU tests: same topology, tiny dims."""
    return ModelConfig(
        latent_dim=64, fusion_dim=32, magpie_dim=16,
        encoder_hidden=(48, 32), decoder_hidden=(32, 48),
        element_embed_dim=16, n_attention_heads=4,
        vocab_size=4752, d_model=32, nhead=4, num_layers=2,
        dim_feedforward=64, max_len=16, n_memory_tokens=4,
        n_stoich_tokens=2, n_heads_tokens=2,
    )
