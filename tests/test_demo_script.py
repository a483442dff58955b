"""End-to-end tests of the evidence/serving scripts (demo_tpu_train.py,
generate.py, evaluate.py) — driven in-process on a tiny CPU config.

Covers the three long-run safety behaviors the TPU records depend on
(periodic checkpoints at eval boundaries, --resume continuation, STOP-file
graceful stop — the preemption contract; SURVEY §5.3: the reference's only
resume path was a manual flag, mnist_moco_ode.py:92-103) and the restore →
sample → score serving loop (reference intended it but its IS module was a
dead import, mnist_moco_ode.py:7,169-173).
"""
import importlib.util
import json
import os
import shutil
import signal
import sys

import numpy as np
import pytest

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "scripts")


def _run_script(name, argv):
    spec = importlib.util.spec_from_file_location(
        name[:-3], os.path.join(_SCRIPTS, name))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    old_term = signal.getsignal(signal.SIGTERM)
    sys.argv = [name] + argv
    try:
        mod.main()
    finally:
        sys.argv = old_argv
        signal.signal(signal.SIGTERM, old_term)  # demo installs its own


_TINY = ["--config", "mnist_ode", "--tiny", "--cpu", "--batch-size", "4",
         "--n-videos", "16", "--eval-every", "1", "--save-checkpoint"]
# the same model surgery --tiny applies, as --set overrides so generate.py /
# evaluate.py build a restore template matching the tiny checkpoint
_TINY_SETS = ["--set", "ngf=8", "--set", "ndf=8", "--set", "dim_z_content=8",
              "--set", "dim_z_motion=4", "--set", "d_iters=1",
              "--set", "batch_size=4"]


def _ckpt_steps(workdir):
    d = os.path.join(workdir, "checkpoints")
    return sorted(int(s) for s in os.listdir(d) if s.isdigit())


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """One 2-step tiny training run with checkpoints, shared by the tests."""
    wd = str(tmp_path_factory.mktemp("demo") / "run")
    _run_script("demo_tpu_train.py", _TINY + ["--steps", "2", "--workdir", wd])
    return wd


def test_periodic_checkpoints_then_resume(tiny_run, tmp_path):
    # eval at every step (eval_every=1) -> a checkpoint per boundary, pruned
    # to max_to_keep=2; the final save lands on the last boundary's step
    assert _ckpt_steps(tiny_run) == [1, 2]
    summary = json.load(open(os.path.join(tiny_run, "history.json")))
    assert summary["steps"] == 2 and summary["all_losses_finite"]

    wd = str(tmp_path / "resumed")
    shutil.copytree(tiny_run, wd)  # keep the shared fixture state pristine
    _run_script("demo_tpu_train.py",
                _TINY + ["--steps", "4", "--workdir", wd, "--resume"])
    summary = json.load(open(os.path.join(wd, "history.json")))
    # resumed run continues from the restored step, not from 0
    assert [r["step"] for r in summary["history"]] == [2, 3]
    assert summary["steps"] == 4
    assert _ckpt_steps(wd) == [3, 4]


def test_stop_file_graceful_stop(tmp_path):
    wd = str(tmp_path / "run")
    os.makedirs(wd)
    open(os.path.join(wd, "STOP"), "w").close()
    # 60 steps requested; the pre-existing STOP file is honored at the first
    # 50-step boundary (step 0) with summary + checkpoint still written
    _run_script("demo_tpu_train.py", _TINY + ["--steps", "60", "--workdir", wd])
    summary = json.load(open(os.path.join(wd, "history.json")))
    assert summary["steps"] == 1 and summary["steps_requested"] == 60
    assert _ckpt_steps(wd) == [1]
    # the STOP file is consumed so a later --resume isn't instantly re-stopped
    assert not os.path.exists(os.path.join(wd, "STOP"))


def test_generate_restores_checkpoint_and_extends_video_len(tiny_run, tmp_path):
    out = str(tmp_path / "samples.npz")
    gif = str(tmp_path / "grid.gif")
    _run_script("generate.py",
                ["--config", "mnist_ode", "--workdir", tiny_run, "--cpu",
                 "--num", "4", "--batch-size", "4", "--video-len", "24",
                 "--out", out, "--gif", gif] + _TINY_SETS)
    videos = np.load(out)["videos"]
    # longer-than-trained clips: the continuous-motion payoff the reference
    # exposed as the video_len override (models/mocogan.py:271)
    assert videos.shape == (4, 24, 28, 28, 1)
    assert np.isfinite(videos).all()
    assert videos.min() >= -1.0 and videos.max() <= 1.0
    assert os.path.getsize(gif) > 0


def test_evaluate_scores_checkpoint(tiny_run, tmp_path):
    assets = str(tmp_path / "assets")
    _run_script("evaluate.py",
                ["--config", "mnist_ode", "--workdir", tiny_run, "--cpu",
                 "--synthetic", "--n-samples", "16", "--batch-size", "8",
                 "--classifier-steps", "2", "--assets-dir", assets]
                + _TINY_SETS)
    result = json.load(open(os.path.join(tiny_run, "eval.json")))
    assert result["checkpoint_step"] == 2
    assert np.isfinite(result["fvd"]) and result["fvd"] >= 0
    assert result["inception_score_mean"] >= 1.0
    assert result["frame_sampling"] == "uniform_random_per_video"
    assert len(result["asset_hashes"]) == 2  # provenance for comparability
