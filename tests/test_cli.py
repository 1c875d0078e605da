"""In-process CLI round trip: train -> checkpoint -> resume -> test phase,
including variable-width bucketed inference (BASELINE configs 1/2/4)."""

import os

import numpy as np
import pytest

from aocr import checkpoint
from aocr.train import main
from tests import synth

ARGS_NET = [
    "-encoder_num_hidden", "32", "-target_embedding_size", "8",
    "-max_decoder_l", "8", "-image_width", "32", "-input_feed",
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli"))
    labels = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
    synth.make_dataset(d, labels, "train.txt", width=32)
    synth.make_dataset(d, labels[:4], "val.txt", width=32)
    return d


def _common(workdir):
    return [
        "-data_base_dir", workdir,
        "-data_path", "train.txt",
        "-val_data_path", "val.txt",
        "-model_dir", os.path.join(workdir, "model"),
        "-log_path", os.path.join(workdir, "log.txt"),
        "-batch_size", "4",
        "-num_batches_val", "1",
    ] + ARGS_NET


def test_train_creates_checkpoints(workdir):
    main(_common(workdir) + [
        "-phase", "train", "-num_epochs", "1", "-steps_per_checkpoint", "2",
    ])
    final = checkpoint.try_load_final(os.path.join(workdir, "model"))
    assert final is not None
    assert final["global_step"] == 2
    assert final["config"]["encoder_num_hidden"] == 32
    assert os.path.exists(os.path.join(workdir, "model", "model-2"))


def test_resume_continues_step_count(workdir):
    main(_common(workdir) + [
        "-phase", "train", "-load_model", "-num_epochs", "1",
        "-steps_per_checkpoint", "2",
    ])
    final = checkpoint.try_load_final(os.path.join(workdir, "model"))
    assert final["global_step"] == 4  # 2 from the first run + 2 more


def test_test_phase_with_visualize(workdir):
    out_dir = os.path.join(workdir, "results")
    main(_common(workdir) + [
        "-phase", "test", "-load_model", "-visualize",
        "-output_dir", out_dir, "-beam_size", "2",
    ])
    results = os.path.join(out_dir, "results.txt")
    assert os.path.exists(results)
    lines = open(results).read().strip().split("\n")
    assert len(lines) == 8
    assert all(len(l.split("\t")) == 5 for l in lines)
    log = open(os.path.join(workdir, "log.txt")).read()
    assert "Accuracy =" in log
    assert "Character error rate" in log
    # visualizer runs on the output
    from aocr.visualizer import generate_html

    html = generate_html.generate(out_dir, workdir)
    assert os.path.exists(html)


def test_variable_width_buckets(tmp_path):
    """Config 2: mixed-width test phase — each width bucket decodes with its
    own static shape."""
    d = str(tmp_path)
    synth.make_dataset(d, ["ab", "cd"], "train.txt", width=32)
    synth.make_dataset(d, ["wxyz", "qrst"], "wide.txt", width=64)
    # merge manifests: two widths in one dataset
    with open(os.path.join(d, "train.txt"), "a") as f:
        for line in open(os.path.join(d, "wide.txt")):
            f.write(line)
    main([
        "-data_base_dir", d,
        "-data_path", "train.txt",
        "-model_dir", os.path.join(d, "model"),
        "-log_path", os.path.join(d, "log.txt"),
        "-batch_size", "2",
        "-phase", "test",
        "-keep_aspect_ratio",
    ] + ARGS_NET)
    log = open(os.path.join(d, "log.txt")).read()
    assert "Number of samples 4" in log


def test_sgd_hyper_flags_reach_optimizer(workdir):
    """-momentum / -weight_decay / -nesterov / -dampening reach
    optim.SGDHyper (reference surface src/optim/optim_sgd.lua:54-91), and
    the momentum buffer round-trips through checkpoints."""
    mdir = os.path.join(workdir, "model_mom")
    args = _common(workdir) + [
        "-phase", "train", "-num_epochs", "1", "-steps_per_checkpoint", "2",
        "-model_dir", mdir,
        "-momentum", "0.9", "-dampening", "0", "-nesterov",
        "-weight_decay", "0.0001",
    ]
    main(args)
    final = checkpoint.try_load_final(mdir)
    assert final is not None
    assert final["config"]["momentum"] == 0.9
    assert final["config"]["nesterov"] is True
    buf = final["optim_state"].get("momentum_buf")
    assert buf is not None
    # buffers are real accumulated velocity, not zeros
    assert any(np.abs(np.asarray(x)).max() > 0
               for x in __import__("jax").tree.leaves(buf))
    # resume restores the buffer without error
    main(args + ["-load_model"])


def test_default_on_bool_flags_accept_both_forms():
    """A boolean whose default flipped to on (use_pallas in v0.2) must keep
    accepting the old affirmative flag as a no-op, not become an argparse
    error."""
    from aocr.config import parse_args

    assert parse_args(["-use_pallas"]).use_pallas is True
    assert parse_args(["-no_use_pallas"]).use_pallas is False
    assert parse_args(["-cache_images"]).cache_images is True
    assert parse_args(["-simple_attention"]).simple_attention is True


def test_explicit_geometry_flags_recorded():
    """parse_args must record geometry flags that were explicitly passed —
    even with their default values — so checkpoint loading lets them
    override the checkpoint's geometry (reference model.lua:75-77)."""
    from aocr.config import Config, parse_args

    cfg = parse_args(["-image_width", "100", "--max_decoder_l=50"])
    assert "image_width" in cfg.explicit_geometry
    assert "max_decoder_l" in cfg.explicit_geometry
    assert "image_height" not in cfg.explicit_geometry
    # both override channels feed geometry_overrides()
    assert cfg.geometry_overrides() >= {"image_width", "max_decoder_l"}
    assert parse_args([]).geometry_overrides() == set()
    # boolean geometry flag counts as explicit too
    cfg2 = parse_args(["-keep_aspect_ratio"])
    assert "keep_aspect_ratio" in cfg2.explicit_geometry
    # API helper marks fields and stays hashable (static jit arg)
    c = Config(image_width=100).with_explicit_geometry("image_width")
    assert c.geometry_overrides() == {"image_width"}
    hash(c)


def test_trainer_restores_buf_fresh_from_checkpoint(workdir, monkeypatch):
    """A checkpoint saved BEFORE the first momentum update carries
    buf_fresh=True; resuming must not treat the (always-present, zeroed)
    buffer as warm — with dampening>0 that would scale the first resumed
    step's gradient by (1-dampening) (reference keys freshness on buffer
    existence, optim_sgd.lua:60-63)."""
    import jax
    from dataclasses import asdict

    from aocr.config import Config
    from aocr.models import model
    from aocr.train import Trainer
    from aocr.utils.logging_util import Logger

    mdir = os.path.join(workdir, "model_fresh")
    cfg = Config(
        encoder_num_hidden=32, target_embedding_size=8, max_decoder_l=8,
        image_width=32, input_feed=True, momentum=0.9, dampening=0.5,
        model_dir=mdir, load_model=True, phase="train",
    ).validate()
    ms = model.init(jax.random.PRNGKey(0), cfg)
    zero_buf = jax.tree.map(np.zeros_like, ms.params)
    log = Logger(os.path.join(workdir, "log_fresh.txt"))
    for saved_fresh, want in ((True, True), (False, False), (None, False)):
        meta = {"learning_rate": 0.1, "eval_counter": 3,
                "momentum_buf": zero_buf}
        if saved_fresh is not None:
            meta["buf_fresh"] = saved_fresh
        checkpoint.save(mdir, ms.params, ms.batch_stats, asdict(cfg), 3, meta)
        tr = Trainer(cfg, log)
        assert bool(np.asarray(tr.opt_state.buf_fresh)) is want, (
            f"saved buf_fresh={saved_fresh} restored as {not want}"
        )


def test_val_driven_lr_schedule():
    """Reference LR semantics (train.lua:87-89,164-168): decay only when val
    loss increases, floor clamp, resume-above-floor."""
    from aocr.train import ValDrivenLR

    s = ValDrivenLR(initial=0.1, minimum=0.001, decay=0.5)
    assert s.lr == 0.1
    assert not s.update(10.0)          # first result: no decay
    assert not s.update(9.0)           # improved: no decay
    assert s.update(9.5) and s.lr == 0.05   # worsened: decay
    assert s.update(9.6) and s.lr == 0.025
    # equality is NOT an increase
    assert not s.update(9.6)
    # floor clamp
    for _ in range(10):
        s.update(s.prev_val_loss + 1.0)
    assert s.lr == 0.001
    # at the floor, no further decay reported
    assert not s.update(s.prev_val_loss + 1.0)
    # resume below the floor clamps up
    s2 = ValDrivenLR(initial=1e-5, minimum=0.001, decay=0.5)
    assert s2.lr == 0.001


def test_no_spelling_for_default_off_booleans(tmp_path):
    """EVERY boolean flag has a -no_<name> spelling: a checkpoint can
    restore a default-off field like keep_aspect_ratio=True, and the CLI
    must be able to override it back off (reference model.lua:75-77)."""
    from aocr.config import parse_args

    cfg = parse_args(["-no_keep_aspect_ratio"])
    assert not cfg.keep_aspect_ratio
    assert "keep_aspect_ratio" in cfg.explicit_geometry

    # end-to-end: checkpoint trained with the flag on, -no_... wins on load
    from aocr.api import AttentionOCR
    from aocr.config import Config

    trained = Config(keep_aspect_ratio=True, image_width=32,
                     encoder_num_hidden=32, target_embedding_size=8,
                     max_decoder_l=8)
    d = str(tmp_path / "m")
    AttentionOCR.create(trained).save(d)
    from aocr.train import Trainer
    from aocr.utils.logging_util import Logger

    over = parse_args([
        "-phase", "test", "-load_model", "-model_dir", d,
        "-no_keep_aspect_ratio",
    ])
    tr = Trainer(over, Logger(str(tmp_path / "log.txt")))
    assert tr.cfg.keep_aspect_ratio is False
    # and WITHOUT the flag the checkpoint's True is restored
    plain = parse_args(["-phase", "test", "-load_model", "-model_dir", d])
    tr2 = Trainer(plain, Logger(str(tmp_path / "log2.txt")))
    assert tr2.cfg.keep_aspect_ratio is True
