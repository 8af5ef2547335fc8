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
    assert int(state.step) == 7
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
