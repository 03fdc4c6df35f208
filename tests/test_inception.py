"""InceptionV3 pool3 extractor: torch-twin numeric parity + importer layout.

torchvision is absent in this environment, so the oracle is a torch twin
transcribed from torchvision's inception.py source layout (BasicConv2d =
bias-free conv + BN(eps=1e-3) + relu; aux head irrelevant to pool3).  The
twin uses torch's own conv/BN/pool kernels, so agreement validates the flax
architecture, padding, pooling and BN-eval semantics — everything except the
shared transcription of the branch topology, which the state-dict key
assertions pin to torchvision's naming."""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from fsvid2vid_tpu.eval.inception import (
    InceptionV3Pool3, import_inception)

pytestmark = pytest.mark.slow  # ~2 min on one CPU


class BC(tnn.Module):  # BasicConv2d
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class IncA(tnn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = BC(cin, 64, kernel_size=1)
        self.branch5x5_1 = BC(cin, 48, kernel_size=1)
        self.branch5x5_2 = BC(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BC(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BC(cin, pool, kernel_size=1)

    def forward(self, x):
        p = F.avg_pool2d(x, 3, 1, 1)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(p)], 1)


class IncB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BC(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BC(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BC(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BC(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class IncC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BC(cin, 192, kernel_size=1)
        self.branch7x7_1 = BC(cin, c7, kernel_size=1)
        self.branch7x7_2 = BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BC(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BC(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BC(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(F.avg_pool2d(x, 3, 1, 1))], 1)


class IncD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BC(cin, 192, kernel_size=1)
        self.branch3x3_2 = BC(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BC(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BC(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BC(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BC(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class IncE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BC(cin, 320, kernel_size=1)
        self.branch3x3_1 = BC(cin, 384, kernel_size=1)
        self.branch3x3_2a = BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BC(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BC(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BC(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(F.avg_pool2d(x, 3, 1, 1))], 1)


class TorchInceptionPool3(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BC(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BC(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BC(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BC(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BC(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280)
        self.Mixed_7c = IncE(2048)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        return x.mean((2, 3))


class TestInceptionParity:
    def test_pool3_matches_torch_twin(self, rng, tmp_path):
        import jax
        import jax.numpy as jnp
        torch.manual_seed(0)
        twin = TorchInceptionPool3().eval()
        # non-trivial BN stats
        with torch.no_grad():
            for m in twin.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.02)
                    m.running_var.uniform_(0.5, 1.5)
        ckpt = str(tmp_path / "inception.pt")
        torch.save(twin.state_dict(), ckpt)

        net = InceptionV3Pool3()
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 299, 299, 3)))["params"]
        params = import_inception(jax.tree.map(np.asarray, params), ckpt)

        x = rng.randn(2, 299, 299, 3).astype(np.float32) * 0.5
        ours = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        assert ours.shape == (2, 2048)
        np.testing.assert_allclose(ours, want, atol=1e-3, rtol=1e-3)

    def test_state_dict_keys_are_torchvision_layout(self):
        """Pin the twin's key set to torchvision's naming so the importer's
        target layout is explicit."""
        twin = TorchInceptionPool3()
        keys = set(twin.state_dict().keys())
        for k in ("Conv2d_1a_3x3.conv.weight", "Conv2d_1a_3x3.bn.weight",
                  "Mixed_5b.branch1x1.conv.weight",
                  "Mixed_6b.branch7x7dbl_5.bn.running_var",
                  "Mixed_7c.branch3x3dbl_3b.conv.weight"):
            assert k in keys, k