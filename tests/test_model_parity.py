"""Whole-model numerical parity: torch test doubles vs our JAX forwards.

These torch modules re-create the three reference architectures (forward
semantics and state-dict key structure) as *test doubles*; converting their
random state dicts and comparing full-network activations validates every
architectural detail end to end — stride placement, padding, BN folding,
upsampling conventions, attention gates, head reshapes.  Combined with the
structure tests this is the strongest offline guarantee that the released
pretrained checkpoints will produce identical outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from face_crop_plus_tpu.models.detection import retinaface_forward  # noqa: E402
from face_crop_plus_tpu.models.enhancement import rrdbnet_forward  # noqa: E402
from face_crop_plus_tpu.models.parsing import bisenet_forward  # noqa: E402
from face_crop_plus_tpu.models.weights import convert_state_dict  # noqa: E402
from face_crop_plus_tpu.ops.nn import Params  # noqa: E402


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.3, m.num_features).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 1.5, m.num_features).astype(np.float32)))
                m.weight.copy_(torch.from_numpy(rng.normal(1, 0.2, m.num_features).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(rng.normal(0, 0.2, m.num_features).astype(np.float32)))


def _to_params(module):
    return Params({
        k: jnp.asarray(v)
        for k, v in convert_state_dict(module.state_dict()).items()
    })


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


# --------------------------------------------------------------------------
# Torch test doubles
# --------------------------------------------------------------------------


class TBottleneck(tnn.Module):
    def __init__(self, cin, width, stride, project):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.downsample = (
            tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4),
            )
            if project
            else None
        )

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = x if self.downsample is None else self.downsample(x)
        return tF.relu(out + sc)


class TResNet50Body(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        cin = 64
        for li, (w, d, s) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], 1
        ):
            blocks = [TBottleneck(cin, w, s, True)]
            cin = w * 4
            blocks += [TBottleneck(cin, w, 1, False) for _ in range(d - 1)]
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = tF.max_pool2d(tF.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def _cbn(cin, cout, k, s=1, p=None, act=True, slope=0.0):
    p = k // 2 if p is None else p
    layers = [tnn.Conv2d(cin, cout, k, s, p, bias=False), tnn.BatchNorm2d(cout)]
    if act:
        layers.append(tnn.LeakyReLU(slope))
    return tnn.Sequential(*layers)


class TSSH(tnn.Module):
    def __init__(self, ch=256):
        super().__init__()
        q = ch // 4
        self.conv3X3 = _cbn(ch, ch // 2, 3, act=False)
        self.conv5X5_1 = _cbn(ch, q, 3)
        self.conv5X5_2 = _cbn(q, q, 3, act=False)
        self.conv7X7_2 = _cbn(q, q, 3)
        self.conv7x7_3 = _cbn(q, q, 3, act=False)

    def forward(self, x):
        b3 = self.conv3X3(x)
        b51 = self.conv5X5_1(x)
        b5 = self.conv5X5_2(b51)
        b7 = self.conv7x7_3(self.conv7X7_2(b51))
        return tF.relu(torch.cat([b3, b5, b7], 1))


class TRetinaFace(tnn.Module):
    def __init__(self):
        super().__init__()
        self.body = TResNet50Body()
        fpn = tnn.Module()
        for i, cin in enumerate([512, 1024, 2048], 1):
            setattr(fpn, f"output{i}", _cbn(cin, 256, 1, p=0))
        fpn.merge1 = _cbn(256, 256, 3)
        fpn.merge2 = _cbn(256, 256, 3)
        self.fpn = fpn
        self.ssh1, self.ssh2, self.ssh3 = TSSH(), TSSH(), TSSH()
        for name, num in [("ClassHead", 2), ("BboxHead", 4), ("LandmarkHead", 10)]:
            lst = tnn.ModuleList()
            for _ in range(3):
                h = tnn.Module()
                h.conv1x1 = tnn.Conv2d(256, 2 * num, 1)
                lst.append(h)
            setattr(self, name, lst)

    def forward(self, x):
        c3, c4, c5 = self.body(x)
        o1 = self.fpn.output1(c3)
        o2 = self.fpn.output2(c4)
        o3 = self.fpn.output3(c5)
        o2 = self.fpn.merge2(o2 + tF.interpolate(o3, size=o2.shape[2:], mode="nearest"))
        o1 = self.fpn.merge1(o1 + tF.interpolate(o2, size=o1.shape[2:], mode="nearest"))
        feats = [self.ssh1(o1), self.ssh2(o2), self.ssh3(o3)]

        def head(mods, num):
            outs = []
            for m, f in zip(mods, feats):
                y = m.conv1x1(f).permute(0, 2, 3, 1).contiguous()
                outs.append(y.view(y.shape[0], -1, num))
            return torch.cat(outs, 1)

        cls = tF.softmax(head(self.ClassHead, 2), dim=-1)
        return cls, head(self.BboxHead, 4), head(self.LandmarkHead, 10)


def test_retinaface_full_parity(rng):
    tm = TRetinaFace().eval()
    _randomize_bn(tm, rng)
    p = _to_params(tm)
    x = rng.normal(0, 50, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_loc, t_ldm = tm(_nchw(x))
    j_cls, j_loc, j_ldm = retinaface_forward(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_loc), t_loc.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_ldm), t_ldm.numpy(), atol=2e-3)


class TRDB(tnn.Module):
    def __init__(self, nf=64, gc=32):
        super().__init__()
        for i, (ci, co) in enumerate(
            [(nf, gc), (nf + gc, gc), (nf + 2 * gc, gc), (nf + 3 * gc, gc), (nf + 4 * gc, nf)],
            1,
        ):
            setattr(self, f"conv{i}", tnn.Conv2d(ci, co, 3, 1, 1))

    def forward(self, x):
        a = tF.leaky_relu(self.conv1(x), 0.2)
        b = tF.leaky_relu(self.conv2(torch.cat([x, a], 1)), 0.2)
        c = tF.leaky_relu(self.conv3(torch.cat([x, a, b], 1)), 0.2)
        d = tF.leaky_relu(self.conv4(torch.cat([x, a, b, c], 1)), 0.2)
        e = self.conv5(torch.cat([x, a, b, c, d], 1))
        return e * 0.2 + x


class TRRDB(tnn.Module):
    def __init__(self):
        super().__init__()
        self.RDB1, self.RDB2, self.RDB3 = TRDB(), TRDB(), TRDB()

    def forward(self, x):
        return self.RDB3(self.RDB2(self.RDB1(x))) * 0.2 + x


class TRRDBNet(tnn.Module):
    def __init__(self, nb=3):
        super().__init__()
        self.conv_first = tnn.Conv2d(3, 64, 3, 1, 1)
        self.RRDB_trunk = tnn.Sequential(*[TRRDB() for _ in range(nb)])
        self.trunk_conv = tnn.Conv2d(64, 64, 3, 1, 1)
        self.upconv1 = tnn.Conv2d(64, 64, 3, 1, 1)
        self.upconv2 = tnn.Conv2d(64, 64, 3, 1, 1)
        self.HRconv = tnn.Conv2d(64, 64, 3, 1, 1)
        self.conv_last = tnn.Conv2d(64, 3, 3, 1, 1)

    def forward(self, x):
        fea0 = self.conv_first(x)
        fea = fea0 + self.trunk_conv(self.RRDB_trunk(fea0))
        fea = tF.leaky_relu(self.upconv1(tF.interpolate(fea, scale_factor=2, mode="nearest")), 0.2)
        fea = tF.leaky_relu(self.upconv2(tF.interpolate(fea, scale_factor=2, mode="nearest")), 0.2)
        return self.conv_last(tF.leaky_relu(self.HRconv(fea), 0.2))


def test_rrdbnet_full_parity(rng):
    tm = TRRDBNet(nb=3).eval()
    p = _to_params(tm)
    x = rng.uniform(0, 1, (1, 16, 20, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(_nchw(x)).numpy()
    ours = np.asarray(rrdbnet_forward(p, jnp.asarray(x), num_blocks=3))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-4)


class TBasic(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = (
            tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )
            if (cin != cout or stride != 1)
            else None
        )

    def forward(self, x):
        r = self.bn2(self.conv2(tF.relu(self.bn1(self.conv1(x)))))
        s = x if self.downsample is None else self.downsample(x)
        return tF.relu(s + r)


class TNamedCBR(tnn.Module):
    def __init__(self, cin, cout, k, s=1, p=None):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = tnn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


class TARM(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TNamedCBR(cin, cout, 3)
        self.conv_atten = tnn.Conv2d(cout, cout, 1, bias=False)
        self.bn_atten = tnn.BatchNorm2d(cout)

    def forward(self, x):
        feat = self.conv(x)
        a = torch.sigmoid(self.bn_atten(self.conv_atten(tF.avg_pool2d(feat, feat.shape[2:]))))
        return feat * a


class TBiSeNet(tnn.Module):
    def __init__(self):
        super().__init__()
        cp = tnn.Module()
        resnet = tnn.Module()
        resnet.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        resnet.bn1 = tnn.BatchNorm2d(64)
        cin = 64
        for li, (cout, s) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)], 1):
            setattr(resnet, f"layer{li}",
                    tnn.Sequential(TBasic(cin, cout, s), TBasic(cout, cout, 1)))
            cin = cout
        cp.resnet = resnet
        cp.arm16 = TARM(256, 128)
        cp.arm32 = TARM(512, 128)
        cp.conv_head32 = TNamedCBR(128, 128, 3)
        cp.conv_head16 = TNamedCBR(128, 128, 3)
        cp.conv_avg = TNamedCBR(512, 128, 1, p=0)
        self.cp = cp

        ffm = tnn.Module()
        ffm.convblk = TNamedCBR(256, 256, 1, p=0)
        ffm.conv1 = tnn.Conv2d(256, 64, 1, bias=False)
        ffm.conv2 = tnn.Conv2d(64, 256, 1, bias=False)
        self.ffm = ffm

        out = tnn.Module()
        out.conv = TNamedCBR(256, 256, 3)
        out.conv_out = tnn.Conv2d(256, 19, 1, bias=False)
        self.conv_out = out

    def forward(self, x):
        r = self.cp.resnet
        y = tF.max_pool2d(tF.relu(r.bn1(r.conv1(x))), 3, 2, 1)
        y = r.layer1(y)
        f8 = r.layer2(y)
        f16 = r.layer3(f8)
        f32 = r.layer4(f16)

        avg = self.cp.conv_avg(tF.avg_pool2d(f32, f32.shape[2:]))
        avg_up = tF.interpolate(avg, f32.shape[2:])
        f32_up = tF.interpolate(self.cp.arm32(f32) + avg_up, f16.shape[2:])
        f32_up = self.cp.conv_head32(f32_up)
        f16_up = tF.interpolate(self.cp.arm16(f16) + f32_up, f8.shape[2:])
        f16_up = self.cp.conv_head16(f16_up)

        fcat = torch.cat([f8, f16_up], 1)
        feat = self.ffm.convblk(fcat)
        a = tF.avg_pool2d(feat, feat.shape[2:])
        a = torch.sigmoid(self.ffm.conv2(tF.relu(self.ffm.conv1(a))))
        feat = feat * a + feat

        o = self.conv_out.conv_out(self.conv_out.conv(feat))
        return tF.interpolate(o, x.shape[2:], mode="bilinear", align_corners=True)


def test_bisenet_full_parity(rng):
    tm = TBiSeNet().eval()
    _randomize_bn(tm, rng)
    p = _to_params(tm)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(_nchw(x)).numpy()
    ours = np.asarray(bisenet_forward(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-3)
