"""Length-bucketed batch serving (acceptance config 5, ``BASELINE.json:11``).

Flow per SURVEY.md §5.8 / §7.2-6:
  1. collect requests (phonemes + reference audio), estimate frame lengths;
  2. exchange per-host bucket histograms (all_gather over DCN when
     multi-host; degenerate identity on one host);
  3. derive the identical global BucketPlan on every host, so the compiled
     program sequence — and therefore the collective schedule — is uniform;
  4. run one jitted synthesis program per bucket (programs are compile-cached
     per (bucket, batch) shape), batches data-parallel over the mesh;
  5. requeue a bucket's batch on per-batch failure (SURVEY.md §5.3).
"""
from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.ops import stft as stft_ops
from styletts_zs_tpu.parallel import bucketing, collectives, mesh as mesh_lib
from styletts_zs_tpu.pipelines.infer import make_synthesis_fn
from styletts_zs_tpu.utils.config import Config, replace


@dataclass
class Request:
    uid: int
    phonemes: np.ndarray       # (T_text,) int32
    ref_wav: np.ndarray        # (T_samples,) float32
    est_frames: int            # caller's length estimate (or max)


@dataclass
class Result:
    uid: int
    mel: np.ndarray
    wav: Optional[np.ndarray]
    frames: int


class Server:
    def __init__(self, cfg: Config, params, *, mesh=None):
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self._programs: dict[tuple, object] = {}
        self.requeued: list[Request] = []

    # ------------------------------------------------------------------

    def _program(self, n_frames: int, batch: int, text_len: int):
        key = (n_frames, batch, text_len)
        if key not in self._programs:
            s = self.cfg.serve
            cfg = replace(self.cfg,
                          model=replace(self.cfg.model, max_frames=n_frames,
                                        max_text_len=text_len))
            fn = make_synthesis_fn(cfg, one_step=s.one_step,
                                   n_steps=s.n_steps, guidance=s.guidance,
                                   n_frames=n_frames,
                                   with_vocoder=s.with_vocoder)
            self._programs[key] = jax.jit(fn)
        return self._programs[key]

    # ------------------------------------------------------------------

    def plan(self, requests: list[Request]) -> bucketing.BucketPlan:
        """Steps 2-3: histogram exchange -> identical global plan."""
        buckets = self.cfg.serve.frame_buckets
        lengths = np.asarray([r.est_frames for r in requests], np.int64)
        local_hist = bucketing.bucket_histogram(lengths, buckets)
        # DCN exchange: sum per-host histograms so every host derives the
        # identical plan; identity on one process.  Exercised by the
        # 2-process CPU smoke test (tests/test_multiprocess.py).
        global_hist = collectives.process_sum_histogram(local_hist)
        return bucketing.plan_buckets(global_hist, self.cfg.serve.batch_size,
                                      buckets)

    def serve_batch(self, requests: list[Request]) -> list[Result]:
        """Synchronous batch service of up to serve.max_global_batch requests."""
        cfg = self.cfg
        s = cfg.serve
        a = cfg.model.audio
        requests = requests[: s.max_global_batch]
        buckets_map = bucketing.assign_to_buckets(
            np.asarray([r.est_frames for r in requests]), s.frame_buckets)
        text_len = cfg.model.max_text_len
        ref_len = 3 * a.sample_rate
        results: list[Result] = []

        for bucket, idxs in buckets_map.items():
            B = s.batch_size
            for start in range(0, len(idxs), B):
                group = [requests[i] for i in idxs[start: start + B]]
                n = len(group)
                pad_n = B - n
                phon = np.zeros((B, text_len), np.int32)
                tlen = np.ones((B,), np.int32)
                refs = np.zeros((B, ref_len), np.float32)
                for j, r in enumerate(group):
                    L = min(len(r.phonemes), text_len)
                    phon[j, :L] = r.phonemes[:L]
                    tlen[j] = L
                    R = min(len(r.ref_wav), ref_len)
                    refs[j, :R] = r.ref_wav[:R]
                try:
                    results.extend(self._dispatch(bucket, phon, tlen, refs,
                                                  group))
                except (jax.errors.JaxRuntimeError, RuntimeError) as e:
                    # transient device/runtime failure -> requeue the batch
                    # (SURVEY.md §5.3).  Shape/compile bugs (TypeError,
                    # ValueError) propagate: requeueing them would loop.
                    print(f"serve: bucket {bucket} batch of {len(group)} "
                          f"failed, requeued: {e!r}", file=sys.stderr)
                    self.requeued.extend(group)
        return results

    def _dispatch(self, bucket, phon, tlen, refs, group) -> list[Result]:
        fn = self._program(bucket, phon.shape[0], phon.shape[1])
        a = self.cfg.model.audio
        ref_mel = stft_ops.mel_spectrogram(jnp.asarray(refs), a)
        ref_lengths = jnp.full((phon.shape[0],), ref_mel.shape[1], jnp.int32)
        sharding = (mesh_lib.batch_sharding(self.mesh)
                    if self.mesh is not None else None)
        args = [jnp.asarray(phon), jnp.asarray(tlen), ref_mel, ref_lengths]
        if sharding is not None:
            args = [jax.device_put(x, sharding) for x in args]
        out, wav = fn(self.params, *args, jax.random.PRNGKey(0))
        mel_np = np.asarray(out.mel)
        wav_np = None if wav is None else np.asarray(wav)
        frames = np.asarray(out.frame_lengths)
        res = []
        for j, r in enumerate(group):
            res.append(Result(
                uid=r.uid, mel=mel_np[j, : frames[j]],
                wav=None if wav_np is None
                else wav_np[j, : frames[j] * a.hop_length],
                frames=int(frames[j])))
        return res
