"""Length-bucketed batch serving (acceptance config 5, ``BASELINE.json:11``).

Flow per SURVEY.md §5.8 / §7.2-6:
  1. collect requests (phonemes + reference audio), estimate frame lengths;
  2. exchange per-host bucket histograms AND the per-request style-code
     table (all_gather over DCN when multi-host, re-gathered over the mesh's
     data axis; ``BASELINE.json:5`` "style-code and length metadata
     exchanged via collectives");
  3. derive the identical global BucketPlan and mixed-speaker dispatch order
     on every host, so the compiled program sequence — and therefore the
     collective schedule — is uniform;
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
        self._style_program = None
        self.requeued: list[Request] = []

    # ------------------------------------------------------------------
    # style-code metadata exchange (BASELINE.json:5 "style-code and length
    # metadata exchanged via collectives"; SURVEY.md §5.8)
    # ------------------------------------------------------------------

    _STYLE_CHUNK = 64  # static-shape prompt-encoder chunk

    def exchange_style_codes(self, requests: list[Request]) -> np.ndarray:
        """Per-request prompt-encoder summaries, exchanged so every host /
        shard holds the identical global (N, d) style table.

        Local compute: chunked fixed-shape prompt-encoder program.  DCN:
        ``collectives.process_concat_styles`` (identity on one host).  ICI:
        when a mesh is attached, the table is re-gathered shard-to-shard via
        ``collectives.gather_style_codes`` so the mixed-speaker assembly
        provably runs off the collective's output.
        """
        a = self.cfg.model.audio
        ref_len = 3 * a.sample_rate
        C = self._STYLE_CHUNK
        if self._style_program is None:
            from styletts_zs_tpu.models.tts import StyleTTSZS
            from styletts_zs_tpu.pipelines.factory import build_models
            acoustic, _, _, _ = build_models(self.cfg)

            def summaries(params, ref_mel):
                _, summary = acoustic.apply(params["acoustic"], ref_mel,
                                            method=StyleTTSZS.encode_prompt)
                return summary
            self._style_program = jax.jit(summaries)

        chunks = []
        for start in range(0, len(requests), C):
            group = requests[start: start + C]
            refs = np.zeros((C, ref_len), np.float32)
            for j, r in enumerate(group):
                L = min(len(r.ref_wav), ref_len)
                refs[j, :L] = r.ref_wav[:L]
            ref_mel = stft_ops.mel_spectrogram(jnp.asarray(refs), a)
            chunks.append(np.asarray(
                self._style_program(self.params, ref_mel))[: len(group)])
        local = np.concatenate(chunks, axis=0) if chunks else \
            np.zeros((0, 1), np.float32)
        table = collectives.process_concat_styles(local)
        if self.mesh is not None and table.shape[0]:
            n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
            pad = -table.shape[0] % n_data
            padded = np.pad(table, [(0, pad)] + [(0, 0)] * (table.ndim - 1))
            sharded = jax.device_put(
                jnp.asarray(padded), mesh_lib.batch_sharding(self.mesh))
            gathered = collectives.gather_style_codes(self.mesh, sharded)
            table = np.asarray(gathered)[: table.shape[0]]
        return table

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
        # mixed-speaker assembly (BASELINE.json:11): exchange the style-code
        # table, then round-robin style clusters within each bucket so every
        # batch mixes speakers — identically on every host (replicated table)
        style_table = self.exchange_style_codes(requests)
        cluster_ids = bucketing.style_cluster_ids(style_table)
        self.last_style_table = style_table
        text_len = cfg.model.max_text_len
        ref_len = 3 * a.sample_rate
        results: list[Result] = []

        for bucket, idxs in buckets_map.items():
            idxs = bucketing.mixed_speaker_order(idxs, cluster_ids)
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
