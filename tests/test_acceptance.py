"""Acceptance runners execute end-to-end on CPU (tiny sizes)."""
from styletts_zs_tpu.pipelines.acceptance import run_acceptance


def test_level_2_zero_shot():
    rep = run_acceptance(2, full_size=False)
    assert rep["config"] == "zs_batch8"
    assert rep["mel_finite"]


def test_level_3_multistep():
    rep = run_acceptance(3, full_size=False)
    assert rep["config"] == "multistep_b32"
    assert rep["mel_finite"]


def test_level_4_longform_wav():
    rep = run_acceptance(4, full_size=False)
    assert rep["config"] == "longform_60s"
    assert rep["wav_finite"]


def test_level_5_serving():
    rep = run_acceptance(5, full_size=False)
    assert rep["completed"] == rep["n_requests"]
    assert rep["requeued"] == 0
