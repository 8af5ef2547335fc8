"""import_torch CLI: reference-format torch checkpoint -> native checkpoint ->
evaluate (the full seeding path for parity evals)."""

import numpy as np
import torch

from tests.test_golden_drn import TorchDRND22


class _TorchHead(torch.nn.Module):
    def __init__(self, n_class=7):
        super().__init__()
        self.score = torch.nn.Conv2d(512, n_class, 1)

    def forward(self, x):
        return self.score(x)


def test_import_torch_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(0)
    tg = TorchDRND22()
    tf1, tf2 = _TorchHead(), _TorchHead()
    ckpt = {
        "epoch": 7,
        "args": {"net": "drn_d_22", "input_ch": 3},
        "g_state_dict": tg.state_dict(),
        "f1_state_dict": tf1.state_dict(),
        "f2_state_dict": tf2.state_dict(),
    }
    torch_path = str(tmp_path / "ref.pth.tar")
    torch.save(ckpt, torch_path)

    from mcseg_tpu.cli.import_torch import main

    prefix = str(tmp_path / "imported")
    main([torch_path, prefix, "--net", "drn_d_22", "--input_ch", "3",
          "--n_class", "7"])

    from mcseg_tpu.utils.checkpoint import load_checkpoint

    state, cfg = load_checkpoint(prefix)
    # step counts iterations for the LR schedule; the torch epoch is metadata
    # and must NOT leak into it (starts fresh at 0).
    assert int(state.step) == 0
    assert cfg.model.net == "drn_d_22"
    # imported conv0 kernel matches the torch stem weights (OIHW->HWIO)
    want = tg.stem[0].weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(state.params["G"]["conv0"]["kernel"]), want, rtol=1e-6
    )
    want_f1 = tf1.score.weight.detach().numpy()[:, :, 0, 0].T
    np.testing.assert_allclose(
        np.asarray(state.params["F1"]["score"]["kernel"])[0, 0], want_f1, rtol=1e-6
    )


def test_import_bare_imagenet_trunk_with_widening(tmp_path):
    """Pretrained seeding end-to-end: a bare 3-channel ImageNet-style trunk
    state_dict (auto-detected) seeds a 6-channel (RGB+HHA) G through first-conv
    widening — the RGB slice survives, extras get the RGB channel mean, and the
    widened trunk's forward on zero-padded extra channels matches torch."""
    import jax.numpy as jnp

    torch.manual_seed(1)
    tg = TorchDRND22()
    with torch.no_grad():
        for m in tg.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
    sd = dict(tg.state_dict())
    # ImageNet trunks carry a classification head our G doesn't have
    sd["fc.weight"] = torch.randn(1000, 512, 1, 1)
    sd["fc.bias"] = torch.randn(1000)
    torch_path = str(tmp_path / "imagenet.pth")
    torch.save(sd, torch_path)

    from mcseg_tpu.cli.import_torch import main

    prefix = str(tmp_path / "seeded")
    main([torch_path, prefix, "--net", "drn_d_22", "--input_ch", "6",
          "--n_class", "7"])

    from mcseg_tpu.models.factory import get_models
    from mcseg_tpu.utils.checkpoint import load_checkpoint

    state, cfg = load_checkpoint(prefix)
    assert cfg.model.input_ch == 6
    k = np.asarray(state.params["G"]["conv0"]["kernel"])  # HWIO, I=6
    want_rgb = tg.stem[0].weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(k[:, :, :3], want_rgb, rtol=1e-6)
    np.testing.assert_allclose(
        k[:, :, 3:], np.repeat(want_rgb.mean(2, keepdims=True), 3, axis=2),
        rtol=1e-5,
    )

    g, _, _ = get_models(cfg.model)
    x3 = np.random.RandomState(0).rand(1, 32, 48, 3).astype(np.float32)
    x6 = np.concatenate([x3, np.zeros_like(x3)], axis=-1)
    ours = g.apply(
        {"params": state.params["G"], "batch_stats": state.batch_stats["G"]},
        jnp.asarray(x6), False,
    )
    theirs = (
        tg.eval()(torch.from_numpy(x3).permute(0, 3, 1, 2))
        .detach().numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)
