"""Which conditioning channel carries speaker identity through the decoder?

r5 finding chain (docs/artifacts/prompt_influence_r5.json): the stage-1
cycle-consistency training embeds the RECONSTRUCTED mel at retrieval 1.0
(training rec view: GT style + GT durations + GT f0/energy), yet the probe's
teacher-forced decode (GT style + GT durations + PREDICTED f0/energy)
retrieves 0/16.  The delta between the two paths is only the prosody
conditioning — this probe decomposes it: the speaker-similarity margin of
the decoded mel with every combination of {GT, predicted} f0 / energy /
durations, GT style throughout.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_identity_carrier.py \
        --workdir runs/r5 --out docs/artifacts/identity_carrier_r5.json
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/r5")
    ap.add_argument("--out", default="docs/artifacts/identity_carrier_r5.json")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from styletts_zs_tpu.models.tts import StyleTTSZS
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.ops.attention import length_mask
    from styletts_zs_tpu.pipelines.checkpoint import load_params
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import build_models, init_params
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    from styletts_zs_tpu.utils.config import Config, tiny_test_config

    enable_compilation_cache()
    cfg = tiny_test_config() if args.tiny else Config()
    like = init_params(cfg, jax.random.PRNGKey(0))
    p = load_params(f"{args.workdir}/stage1",
                    like={"acoustic": like["acoustic"],
                          "vocoder": like["vocoder"]})
    p_ac = p["acoustic"]
    acoustic, _, vocoder, _ = build_models(cfg)
    m = cfg.model
    n_frames = min(m.max_frames, 128 if args.tiny else 256)
    b = SyntheticDataset(m, batch_size=cfg.train.batch_size,
                         seed=cfg.train.seed + 10_000,
                         n_frames=n_frames).next_batch()
    phonemes = jnp.asarray(b.phonemes)
    text_mask = length_mask(jnp.asarray(b.text_lengths), phonemes.shape[1])
    frame_mask = length_mask(jnp.asarray(b.frame_lengths), n_frames)
    mel_gt = stft_ops.mel_spectrogram(jnp.asarray(b.wav), m.audio)[:, :n_frames]
    ref_mel = stft_ops.mel_spectrogram(jnp.asarray(b.ref_wav), m.audio)
    styled_gt, _, _ = acoustic.apply(p_ac, mel_gt, frame_mask,
                                     method=StyleTTSZS.extract_style)
    f0, en = jnp.asarray(b.f0), jnp.asarray(b.energy)
    dur = jnp.asarray(b.durations)

    def embed_mel(mel):
        _, s = acoustic.apply(p_ac, mel, method=StyleTTSZS.encode_prompt)
        e = np.asarray(s, np.float32)
        return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-8)

    e_ref = embed_mel(ref_mel)

    def margin_of(mel):
        sims = embed_mel(mel) @ e_ref.T
        B = sims.shape[0]
        pos = np.diag(sims).copy()
        acc = float((sims.argmax(1) == np.arange(B)).mean())
        np.fill_diagonal(sims, -np.inf)
        return {"margin": round(float((pos - sims.max(1)).mean()), 4),
                "retrieval": round(acc, 4)}

    def decode(*, durations=None, f0_t=None, en_t=None):
        out = acoustic.apply(p_ac, phonemes, styled_gt, text_mask=text_mask,
                             durations=durations, n_frames=n_frames,
                             f0_target=f0_t, energy_target=en_t,
                             method=StyleTTSZS.text_to_mel)
        return out

    cases = {
        "recon_gt_all": dict(durations=dur, f0_t=f0, en_t=en),
        "gt_f0_pred_energy": dict(durations=dur, f0_t=f0),
        "pred_f0_gt_energy": dict(durations=dur, en_t=en),
        "pred_prosody": dict(durations=dur),
        "free_running": dict(),
    }
    out_j: dict = {"workdir": args.workdir,
                   "gt_mel": margin_of(mel_gt)}
    voc_case = "recon_gt_all"
    for name, kw in cases.items():
        o = decode(**kw)
        row = margin_of(o.mel)
        out_j[name] = row
        print(json.dumps({name: row}), flush=True)
        if name == voc_case:
            wav = vocoder.apply(p["vocoder"], o.mel, mask=o.frame_mask)
            mel_voc = stft_ops.mel_spectrogram(wav, m.audio)
            out_j["recon_gt_all_vocoded"] = margin_of(mel_voc)
            print(json.dumps(
                {"recon_gt_all_vocoded": out_j["recon_gt_all_vocoded"]}),
                flush=True)

    with open(args.out, "w") as f:
        json.dump(out_j, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
