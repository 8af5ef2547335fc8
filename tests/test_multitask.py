"""Multitask (seg + aux depth) steps: losses finite & decreasing; depth head
params live under 'D' and train in step A only (SURVEY.md section 2 multitask
variant)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.core.config import ModelConfig, TrainConfig
from mcseg_tpu.models.factory import get_models
from mcseg_tpu.train.multitask import (
    init_multitask_state,
    make_multitask_mcd_step,
    make_multitask_source_step,
)

HW = (16, 16)
NCLASS = 5


def _setup(num_k=1):
    mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype="float32")
    tcfg = TrainConfig(lr=0.05, num_k=num_k, lr_schedule="constant", max_steps=100)
    state, tx_g, tx_f, d_head = init_multitask_state(
        mcfg, tcfg, jax.random.key(0), img_shape=HW
    )
    g, f1, f2 = get_models(mcfg)
    return mcfg, tcfg, state, tx_g, tx_f, g, f1, f2, d_head


def _batch(seed=0, b=2):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(b, *HW, 3).astype(np.float32))
    label = jnp.asarray(rng.randint(0, NCLASS, size=(b, *HW)))
    depth = jnp.asarray(rng.rand(b, *HW).astype(np.float32) * 3 + 0.3)
    return img, label, depth


def test_multitask_state_has_depth_subtree():
    _, _, state, _, _, _, _, _, _ = _setup()
    assert "D" in state.params
    assert jax.tree.leaves(state.params["D"])


def test_multitask_source_step_decreases_loss():
    _, tcfg, state, tx_g, tx_f, g, f1, f2, d_head = _setup()
    step = jax.jit(make_multitask_source_step(g, f1, f2, d_head, tx_g, tx_f, tcfg))
    img, label, depth = _batch()
    losses = []
    for _ in range(6):
        state, m = step(state, img, label, depth)
        losses.append(float(m["loss"]))
        assert np.isfinite(m["loss_seg"]) and np.isfinite(m["loss_depth"])
    assert losses[-1] < losses[0], losses


def test_multitask_mcd_step_runs():
    _, tcfg, state, tx_g, tx_f, g, f1, f2, d_head = _setup(num_k=2)
    step = jax.jit(make_multitask_mcd_step(g, f1, f2, d_head, tx_g, tx_f, tcfg))
    xs, ys, ds = _batch(0)
    xt, _, _ = _batch(1)
    d0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params["D"])
    state, m = step(state, xs, ys, ds, xt)
    for k in ("loss_source", "loss_seg", "loss_depth", "loss_b", "loss_dis"):
        assert np.isfinite(float(m[k])), (k, m)
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(state.params["D"]))
    )
    assert changed  # depth head updated in step A


def test_depth_metrics():
    import jax.numpy as jnp
    from mcseg_tpu.eval.depth_metrics import depth_metrics

    t = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8).astype(np.float32) + 0.5)
    m = depth_metrics(t[..., None], t)
    assert float(m["rmse"]) < 1e-6
    assert float(m["abs_rel"]) < 1e-6
    assert float(m["delta_1.25"]) == 1.0
    m2 = depth_metrics(t[..., None] * 1.5, t)
    assert float(m2["abs_rel"]) > 0.4
    assert float(m2["delta_1.25"]) == 0.0
    # invalid pixels excluded
    t3 = t.at[0, 0, 0].set(0.0)
    m3 = depth_metrics(t[..., None], t3)
    assert float(m3["rmse"]) < 1e-6


import pytest


@pytest.mark.slow
def test_multitask_e2e_train_resume_eval(tmp_path):
    """Full multitask lifecycle: train (per-epoch checkpoints) -> resume from
    the epoch checkpoint (D subtree restored) -> evaluate with depth metrics
    (rmse/abs_rel/delta printed in the table)."""
    import dataclasses

    from mcseg_tpu.core.config import DataConfig, ExperimentConfig
    from mcseg_tpu.data.datasets import SyntheticDataset
    from mcseg_tpu.eval.tester import evaluate
    from mcseg_tpu.train.loops import train_multitask
    from mcseg_tpu.utils.checkpoint import load_checkpoint

    dcfg = DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                      batch_size=8, train_img_shape=(32, 32),
                      test_img_shape=(32, 32), input_ch=3, n_class=NCLASS,
                      max_samples=8, num_workers=2)
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS,
                          dtype="float32"),
        data=dcfg,
        train=TrainConfig(lr=0.02, num_k=1, epochs=1, lr_schedule="constant",
                          max_steps=100, log_every=1,
                          out_dir=str(tmp_path / "run")),
    )
    state = train_multitask(cfg, adapt=False, max_iterations=2)
    assert (tmp_path / "run" / "last.msgpack").exists()

    # resume from 'last': D subtree must be restored, step continues.
    # epochs is the TOTAL budget and resume continues at the checkpointed
    # epoch, so extend it to 2 (epochs=1 would be a completed run, no-op).
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=2,
                                       resume=str(tmp_path / "run" / "last"),
                                       out_dir=str(tmp_path / "run2")))
    restored, _ = load_checkpoint(str(tmp_path / "run" / "last"))
    assert "D" in restored.params
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params["D"])[0]),
        np.asarray(jax.tree.leaves(state.params["D"])[0]),
    )
    state2 = train_multitask(cfg2, adapt=False, max_iterations=1)
    assert int(jax.device_get(state2.step)) == int(jax.device_get(state.step)) + 1

    # resume guard: a non-multitask checkpoint is rejected
    from mcseg_tpu.train.loops import train_source

    cfg3 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       out_dir=str(tmp_path / "src_run")))
    train_source(cfg3, max_iterations=1)
    cfg4 = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, resume=str(tmp_path / "src_run" / "last"),
            out_dir=str(tmp_path / "run3")))
    with pytest.raises(ValueError, match="multitask"):
        train_multitask(cfg4, adapt=False, max_iterations=1)

    # evaluation includes the depth triple (synthetic corpus carries depth)
    ds = SyntheticDataset(dcfg, "val")
    miou, hist, table = evaluate(state2, cfg, ds, print_table=False,
                                 max_batches=2)
    assert "rmse=" in table and "abs_rel=" in table and "delta<1.25=" in table


def test_multitask_depth_supervision_is_crop_consistent():
    """pp(with_depth=True) returns depth that went through the SAME geometry
    as the image: flipping is joint, so the depth target of a flipped sample
    is the mirrored depth."""
    from mcseg_tpu.core.config import DataConfig
    from mcseg_tpu.ops.preprocess import make_train_preprocess

    dcfg = DataConfig(src_dataset="synthetic", batch_size=2,
                      train_img_shape=(16, 16), input_ch=3,
                      random_crop=False, random_flip=True)
    pp = make_train_preprocess(dcfg, with_depth=True)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (4, 16, 16, 3)).astype(np.uint8),
        "label": rng.randint(0, NCLASS, (4, 16, 16)).astype(np.uint8),
        "depth": rng.rand(4, 16, 16).astype(np.float32) * 3 + 0.5,
    }
    img, label, dep = jax.jit(pp)(batch, jax.random.key(3))
    assert dep.shape == (4, 16, 16)
    # each sample's depth is either the original or its mirror — and it is
    # mirrored exactly when the image plane is mirrored
    mean = np.asarray(jnp.asarray([0.485, 0.456, 0.406]))
    std = np.asarray(jnp.asarray([0.229, 0.224, 0.225]))
    for i in range(4):
        orig_rgb = batch["image"][i].astype(np.float32) / 255.0
        got_rgb = np.asarray(img[i]) * std + mean
        flipped = np.allclose(got_rgb, orig_rgb[:, ::-1], atol=1e-5)
        if flipped:
            np.testing.assert_allclose(np.asarray(dep[i]),
                                       batch["depth"][i][:, ::-1], atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(dep[i]),
                                       batch["depth"][i], atol=1e-5)


def test_depth_metrics_negative_predictions_are_failures():
    """A non-positive depth prediction must NOT count as delta<1.25 accurate
    (p/t and t/p are both <= 0 there, so a naive max-ratio scores it as a
    hit)."""
    import jax.numpy as jnp

    from mcseg_tpu.eval.depth_metrics import depth_metrics

    t = jnp.full((1, 2, 2), 2.0)
    p = jnp.array([[[-1.0, 0.0], [2.0, 2.0]]])
    m = depth_metrics(p[..., None], t)
    assert float(m["delta_1.25"]) == 0.5  # only the two exact pixels


@pytest.mark.slow
def test_multitask_eval_every_epochs_hook(tmp_path, capsys):
    """--eval_every_epochs on the multitask CLI: the epoch-end hook must be
    wired (it was silently dropped once) and print val mIoU."""
    from mcseg_tpu.cli import multitask_train

    multitask_train.main([
        "synthetic", "synthetic", "--net", "drn_d_22", "--dtype", "float32",
        "--batch_size", "8", "--train_img_shape", "32", "32",
        "--max_samples", "8", "--epochs", "1", "--lr", "0.02", "--num_k", "1",
        "--lr_schedule", "constant", "--log_every", "1", "--source_only",
        "--eval_every_epochs", "1", "--out_dir", str(tmp_path / "run"),
    ])
    out = capsys.readouterr().out
    assert "val_miou=" in out


# ---------------------------------------------------------------------------
# Auxiliary boundary-detection head (SURVEY.md section 2 multitask row:
# "seg + auxiliary depth-estimation (and/or boundary) heads")
# ---------------------------------------------------------------------------


def test_boundary_targets_from_labels():
    from mcseg_tpu.losses.seg import boundary_targets_from_labels

    # two vertical half-planes of classes 0|1, with one ignore pixel
    lbl = np.zeros((1, 4, 6), np.int32)
    lbl[:, :, 3:] = 1
    lbl[0, 0, 0] = 255
    tgt, valid = jax.jit(boundary_targets_from_labels)(jnp.asarray(lbl))
    tgt, valid = np.asarray(tgt), np.asarray(valid)
    # both sides of the class edge (cols 2 and 3) are boundary
    expected = np.zeros((1, 4, 6), np.float32)
    expected[:, :, 2:4] = 1.0
    expected[0, 0, 0] = 0.0  # ignore pixel is never a positive
    np.testing.assert_array_equal(tgt, expected)
    assert not valid[0, 0, 0] and valid[0, 1, 0]
    # edges *against* ignore pixels are not boundaries: the neighbor of the
    # ignore pixel stays negative even though labels "differ"
    assert tgt[0, 0, 1] == 0.0 and tgt[0, 1, 0] == 0.0


def test_balanced_bce_2d():
    from mcseg_tpu.losses.seg import balanced_bce_2d

    tgt = np.zeros((1, 8, 8), np.float32)
    tgt[0, 4, :] = 1.0  # 8 of 64 pixels positive
    t = jnp.asarray(tgt)
    # near-perfect logits -> small loss
    good = jnp.where(t > 0.5, 10.0, -10.0)[..., None]
    assert float(balanced_bce_2d(good, t)) < 1e-3
    # all-negative prediction: class balancing must keep the missed positives
    # visible (plain BCE would average them away at 12.5% frequency)
    lazy = jnp.full((1, 8, 8, 1), -10.0)
    assert float(balanced_bce_2d(lazy, t)) > 1.0
    # invalid pixels are excluded: making ONLY the positives invalid leaves a
    # perfectly-predicted negative field -> tiny loss
    valid = jnp.asarray(t < 0.5)
    assert float(balanced_bce_2d(lazy, t, valid)) < 1e-3


def _setup_boundary(num_k=1):
    mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=NCLASS, dtype="float32")
    tcfg = TrainConfig(lr=0.05, num_k=num_k, lr_schedule="constant", max_steps=100)
    state, tx_g, tx_f, d_head = init_multitask_state(
        mcfg, tcfg, jax.random.key(0), img_shape=HW, with_boundary=True
    )
    from mcseg_tpu.models.heads import BoundaryDetector

    b_head = BoundaryDetector(upsample=mcfg.upsample)
    g, f1, f2 = get_models(mcfg)
    return mcfg, tcfg, state, tx_g, tx_f, g, f1, f2, d_head, b_head


def test_multitask_boundary_source_step_decreases_loss():
    _, tcfg, state, tx_g, tx_f, g, f1, f2, d_head, b_head = _setup_boundary()
    assert "B" in state.params
    step = jax.jit(make_multitask_source_step(
        g, f1, f2, d_head, tx_g, tx_f, tcfg,
        b_head=b_head, boundary_weight=1.0))
    img, label, depth = _batch()
    losses, blosses = [], []
    for _ in range(8):
        state, m = step(state, img, label, depth)
        losses.append(float(m["loss"]))
        blosses.append(float(m["loss_boundary"]))
        assert np.isfinite(m["loss_boundary"])
    assert losses[-1] < losses[0], losses
    assert blosses[-1] < blosses[0], blosses


def test_multitask_boundary_mcd_step_updates_b_in_step_a_only():
    _, tcfg, state, tx_g, tx_f, g, f1, f2, d_head, b_head = _setup_boundary(num_k=2)
    step = jax.jit(make_multitask_mcd_step(
        g, f1, f2, d_head, tx_g, tx_f, tcfg,
        b_head=b_head, boundary_weight=1.0))
    xs, ys, ds = _batch(0)
    xt, _, _ = _batch(1)
    b0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params["B"])
    state, m = step(state, xs, ys, ds, xt)
    assert np.isfinite(float(m["loss_boundary"]))
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(b0), jax.tree.leaves(state.params["B"]))
    )
    assert changed


def test_boundary_checkpoint_roundtrip_and_eval(tmp_path):
    """'B' subtree survives the checkpoint round-trip (auto-detected skeleton)
    and the tester reports boundary precision/recall/F1 for such checkpoints."""
    from mcseg_tpu.core.config import DataConfig, ExperimentConfig
    from mcseg_tpu.data.datasets import SyntheticDataset
    from mcseg_tpu.eval.tester import evaluate
    from mcseg_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    mcfg, tcfg, state, *_ = _setup_boundary()
    dcfg = DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                      batch_size=4, train_img_shape=(16, 16),
                      test_img_shape=(16, 16), input_ch=3, n_class=NCLASS,
                      max_samples=4, num_workers=1)
    cfg = ExperimentConfig(model=mcfg, data=dcfg, train=tcfg)
    save_checkpoint(str(tmp_path / "ck"), state, cfg)
    restored, _ = load_checkpoint(str(tmp_path / "ck"))
    assert "B" in restored.params
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params["B"])[0]),
        np.asarray(jax.tree.leaves(state.params["B"])[0]),
    )
    ds = SyntheticDataset(dcfg, "val")
    _, _, table = evaluate(restored, cfg, ds, print_table=False, max_batches=1)
    assert "boundary (strict):" in table and "f1=" in table
    assert "boundary (tol=2px):" in table


def test_boundary_tolerant_scoring_forgives_small_offsets():
    """A prediction edge 2 px off the true edge scores ~0 under strict
    per-pixel matching but ~1.0 under the 2-px tolerant (BF-score-style)
    matching — the VERDICT r2 #5 fix: the tolerant numbers are the ones
    comparable to published boundary benchmarks."""
    from mcseg_tpu.eval.tester import boundary_match_sums

    # true edge between cols 7|8 -> positives at cols 7 and 8
    lbl = np.zeros((1, 16, 16), np.int32)
    lbl[:, :, 8:] = 1
    # predicted edge shifted 2 px right: logits positive at cols 9 and 10
    logits = np.full((1, 16, 16, 1), -5.0, np.float32)
    logits[:, :, 9:11, 0] = 5.0
    s = jax.jit(boundary_match_sums)(jnp.asarray(logits), jnp.asarray(lbl))
    s = {k: float(v) for k, v in s.items()}
    # strict: only col-8-vs-9/10 overlap... actually no overlap at all
    assert s["tp"] == 0.0 and s["fp"] == 32.0 and s["fn"] == 32.0
    # tolerant: every predicted pixel is within 2 px of a true edge and
    # every true-edge pixel is within 2 px of a prediction
    assert s["tp_tol_p"] == s["n_pred"] == 32.0
    assert s["tp_tol_r"] == s["n_gt"] == 32.0

    # a gross (4 px) offset is NOT forgiven at tol=2
    far = np.full((1, 16, 16, 1), -5.0, np.float32)
    far[:, :, 12:14, 0] = 5.0
    s2 = boundary_match_sums(jnp.asarray(far), jnp.asarray(lbl))
    assert float(s2["tp_tol_p"]) == 0.0 and float(s2["tp_tol_r"]) == 0.0


def test_epoch_eval_hook_with_boundary_head():
    """Regression: the --eval_every_epochs hook's prebuilt eval step used to
    omit the boundary flag while evaluate() inferred it from the params
    ('B' subtree) — misparsing the step's result tuple (IndexError). The
    result layout is now read off the step itself (eval_step.flags)."""
    from mcseg_tpu.cli._epoch_eval import make_epoch_eval_hook
    from mcseg_tpu.core.config import DataConfig, ExperimentConfig
    from mcseg_tpu.parallel.mesh import make_mesh

    mcfg, tcfg, state, *_ = _setup_boundary()
    cfg = ExperimentConfig(
        model=mcfg,
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=2, train_img_shape=(16, 16),
                        test_img_shape=(16, 16), input_ch=3, max_samples=4),
        train=tcfg,
    )
    hook = make_epoch_eval_hook(cfg, make_mesh(1), every=1)
    hook(1, state)  # used to raise IndexError mid-training
    hook(2, state)  # cached-step path
