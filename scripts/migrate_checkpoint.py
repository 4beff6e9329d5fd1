#!/usr/bin/env python3
"""Checkpoint migration CLI.

Equivalent of the reference migration suite
(reference: scripts/migrate_v12_to_v13.py, migrate_v13_to_v14.py,
migrate_vocab_expansion.py, migrate_checkpoint_v1242_wider.py): converts
PyTorch reference checkpoints to our Orbax format, expands decoder
vocabularies (isotope rows initialized from parent elements), and deepens
decoders function-preservingly.

Usage:
    # torch .pt -> orbax
    python scripts/migrate_checkpoint.py from-torch ckpt.pt --out outputs/converted
    # grow vocab (e.g. after adding fractions/isotopes)
    python scripts/migrate_checkpoint.py expand-vocab outputs/checkpoints/best \
        --new-vocab 4800 --out outputs/expanded
    # add decoder layers
    python scripts/migrate_checkpoint.py deepen outputs/checkpoints/best \
        --layers 2 --out outputs/deeper
    # widen the whole decoder (function-preserving, integer factor)
    python scripts/migrate_checkpoint.py widen outputs/checkpoints/best \
        --d-model 1152 --out outputs/wider
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)

    t = sub.add_parser('from-torch')
    t.add_argument('checkpoint')
    t.add_argument('--out', required=True)

    e = sub.add_parser('expand-vocab')
    e.add_argument('checkpoint')
    e.add_argument('--new-vocab', type=int, required=True)
    e.add_argument('--out', required=True)

    d = sub.add_parser('deepen')
    d.add_argument('checkpoint')
    d.add_argument('--layers', type=int, default=1)
    d.add_argument('--out', required=True)

    we = sub.add_parser('widen-encoder')
    we.add_argument('checkpoint')
    we.add_argument('--factor', type=int, default=2,
                    help='integer widening factor for fusion_dim and both '
                         'hidden stacks')
    we.add_argument('--noise', type=float, default=0.0)
    we.add_argument('--out', required=True)

    w = sub.add_parser('widen')
    w.add_argument('checkpoint')
    w.add_argument('--d-model', type=int, required=True,
                   help='new d_model (integer multiple of the old)')
    w.add_argument('--ffn', type=int, default=None,
                   help='new dim_feedforward (default: scale with d_model)')
    w.add_argument('--noise', type=float, default=0.0,
                   help='symmetry-breaking noise on duplicated units')
    w.add_argument('--out', required=True)

    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    from superconductor_vae_tpu.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    from superconductor_vae_tpu.models.config import ModelConfig
    from superconductor_vae_tpu.training import TrainConfig
    from superconductor_vae_tpu.training.train_step import TrainState
    import jax.numpy as jnp

    tcfg = TrainConfig()

    if args.cmd == 'from-torch':
        from superconductor_vae_tpu.checkpoint.torch_convert import (
            load_torch_checkpoint,
        )
        enc, dec, mcfg, meta = load_torch_checkpoint(args.checkpoint)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           enc_params=enc, dec_params=dec,
                           enc_opt=None, dec_opt=None)
        path = save_checkpoint(args.out, state, mcfg, tcfg,
                               epoch=int(meta.get('epoch', 0)),
                               metrics=meta, tag='converted')
        print(f'converted torch checkpoint -> {path} '
              f'(detected {mcfg.d_model=} {mcfg.num_layers=} '
              f'{mcfg.vocab_size=})')
        return

    restored, meta = load_checkpoint(args.checkpoint)
    mcfg = ModelConfig(**{k: tuple(v) if isinstance(v, list) else v
                          for k, v in meta['model_config'].items()})

    if args.cmd == 'expand-vocab':
        from superconductor_vae_tpu.models.surgery import (
            expand_decoder_vocab, isotope_parent_map,
        )
        from superconductor_vae_tpu.tokenizer import default_tokenizer
        pmap = isotope_parent_map(default_tokenizer(max_len=mcfg.max_len))
        new_dec = expand_decoder_vocab(restored['dec_params'],
                                       args.new_vocab, parent_map=pmap)
        mcfg2 = dataclasses.replace(mcfg, vocab_size=args.new_vocab)
        suffix = 'vocab-expanded'
    elif args.cmd == 'deepen':
        from superconductor_vae_tpu.models.surgery import deepen_decoder
        new_dec = deepen_decoder(restored['dec_params'], args.layers)
        mcfg2 = dataclasses.replace(
            mcfg, num_layers=mcfg.num_layers + args.layers)
        suffix = f'deepened+{args.layers}'
    elif args.cmd == 'widen':
        # reference: scripts/migrate_checkpoint_v1242_wider.py
        from superconductor_vae_tpu.models.surgery import (
            expand_decoder_width, widened_config,
        )
        new_ffn = args.ffn or mcfg.dim_feedforward * args.d_model // mcfg.d_model
        new_dec = expand_decoder_width(restored['dec_params'], mcfg,
                                       args.d_model, new_ffn,
                                       noise=args.noise)
        mcfg2 = widened_config(mcfg, args.d_model, new_ffn)
        suffix = f'widened-{args.d_model}'
    else:  # widen-encoder (reference: net2net_expansion.py:954)
        from superconductor_vae_tpu.models.surgery import (
            expand_encoder_widths, widened_encoder_config,
        )
        k = args.factor
        neh = tuple(w * k for w in mcfg.encoder_hidden)
        ndh = tuple(w * k for w in mcfg.decoder_hidden)
        new_enc = expand_encoder_widths(restored['enc_params'], mcfg,
                                        mcfg.fusion_dim * k, neh, ndh,
                                        noise=args.noise)
        mcfg2 = widened_encoder_config(mcfg, mcfg.fusion_dim * k, neh, ndh)
        restored['enc_params'] = new_enc
        new_dec = restored['dec_params']
        suffix = f'encoder-widened-x{k}'

    state = TrainState(step=jnp.zeros((), jnp.int32),
                       enc_params=restored['enc_params'],
                       dec_params=new_dec, enc_opt=None, dec_opt=None,
                       set_params=restored.get('set_params'))
    path = save_checkpoint(args.out, state, mcfg2, tcfg,
                           epoch=int(meta.get('epoch', 0)), tag=suffix)
    print(f'{suffix} -> {path}')


if __name__ == '__main__':
    main()
