"""ResNet encoder: torch-oracle Bottleneck parity + trunk shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from mars_tpu.models import resnet as R


def torch_bottleneck(cin, planes, stride):
    """torchvision-v1.5 Bottleneck built from plain torch.nn (oracle)."""
    class B(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.down = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

        def forward(self, x):
            h = torch.relu(self.bn1(self.conv1(x)))
            h = torch.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
            return torch.relu(h + self.down(x))

    m = B().eval()
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
    return m


class TestBottleneck:
    def test_matches_torch(self):
        torch.manual_seed(0)
        m = torch_bottleneck(8, 4, stride=2)
        sd = {
            "layer1.0.conv1.weight": m.conv1.weight.detach().numpy(),
            "layer1.0.conv2.weight": m.conv2.weight.detach().numpy(),
            "layer1.0.conv3.weight": m.conv3.weight.detach().numpy(),
            "layer1.0.downsample.0.weight": m.down[0].weight.detach().numpy(),
        }
        for name, mod in [("bn1", m.bn1), ("bn2", m.bn2), ("bn3", m.bn3),
                          ("downsample.1", m.down[1])]:
            sd[f"layer1.0.{name}.weight"] = mod.weight.detach().numpy()
            sd[f"layer1.0.{name}.bias"] = mod.bias.detach().numpy()
            sd[f"layer1.0.{name}.running_mean"] = mod.running_mean.numpy()
            sd[f"layer1.0.{name}.running_var"] = mod.running_var.numpy()
        # stem keys (unused by this test, required by the converter)
        sd["conv1.weight"] = np.zeros((8, 3, 7, 7), np.float32)
        for k, v in [("weight", np.ones(8)), ("bias", np.zeros(8)),
                     ("running_mean", np.zeros(8)), ("running_var", np.ones(8))]:
            sd[f"bn1.{k}"] = v.astype(np.float32)
        cfg = R.ResNetConfig(layers=(1,), width=8)
        params = R.convert_torchvision(sd, cfg)

        x = torch.randn(1, 8, 16, 16)
        with torch.no_grad():
            want = m(x).numpy()
        got = R._bottleneck(
            params["layer1"]["block0"],
            jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))), stride=2,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(want, (0, 2, 3, 1)), atol=5e-4, rtol=1e-3
        )


class TestTrunk:
    def test_resnet50_shapes(self):
        cfg = R.ResNetConfig(layers=R.BOTTLENECK_LAYERS["resnet50"], width=16)
        params = R.init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
        f = R.forward_features(params, x, cfg)
        assert f.shape == (1, 2, 2, 16 * 8 * 4)
        pf = R.patch_features(f)
        assert pf.shape == (4, 16 * 8 * 4)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(pf), axis=1), 1.0, atol=1e-4)
