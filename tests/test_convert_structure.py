"""Full-model checkpoint-structure verification for all three models.

Constructs torch modules whose state-dict key sets match the reference
checkpoints exactly (torchvision-style ResNet-50 under ``body.`` for the
detector; the BiSeNet layout for the parser), converts them, and verifies
name/shape parity against our model structure.  Together with the
block-level numerical parity tests this gives end-to-end confidence that
the real released ``.pth`` files will convert and load correctly.
"""

import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from face_crop_plus_tpu.convert import verify_structure  # noqa: E402
from face_crop_plus_tpu.models.weights import convert_state_dict  # noqa: E402


# --- torchvision-compatible ResNet-50 skeleton (state-dict keys only) -----


class _Bottleneck(tnn.Module):
    def __init__(self, cin, width, stride, project):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        if project:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4),
            )


def _resnet50_body():
    m = tnn.Module()
    m.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
    m.bn1 = tnn.BatchNorm2d(64)
    cin = 64
    for li, (width, depth, stride) in enumerate(
        [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1
    ):
        blocks = [_Bottleneck(cin, width, stride, project=True)]
        cin = width * 4
        blocks += [_Bottleneck(cin, width, 1, project=False) for _ in range(depth - 1)]
        setattr(m, f"layer{li}", tnn.Sequential(*blocks))
    return m


def _conv_bn(cin, cout, k, s=1, p=None):
    p = k // 2 if p is None else p
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, s, p, bias=False), tnn.BatchNorm2d(cout)
    )


def _retinaface_state_dict():
    net = tnn.Module()
    net.body = _resnet50_body()

    fpn = tnn.Module()
    for i, cin in enumerate([512, 1024, 2048], start=1):
        setattr(fpn, f"output{i}", _conv_bn(cin, 256, 1, p=0))
    fpn.merge1 = _conv_bn(256, 256, 3)
    fpn.merge2 = _conv_bn(256, 256, 3)
    net.fpn = fpn

    def ssh():
        m = tnn.Module()
        m.conv3X3 = _conv_bn(256, 128, 3)
        m.conv5X5_1 = _conv_bn(256, 64, 3)
        m.conv5X5_2 = _conv_bn(64, 64, 3)
        m.conv7X7_2 = _conv_bn(64, 64, 3)
        m.conv7x7_3 = _conv_bn(64, 64, 3)
        return m

    net.ssh1, net.ssh2, net.ssh3 = ssh(), ssh(), ssh()

    def head(num_out):
        lst = tnn.ModuleList()
        for _ in range(3):
            h = tnn.Module()
            h.conv1x1 = tnn.Conv2d(256, 2 * num_out, 1)
            lst.append(h)
        return lst

    net.ClassHead = head(2)
    net.BboxHead = head(4)
    net.LandmarkHead = head(10)
    return net.state_dict()


def test_retinaface_structure_roundtrip():
    converted = convert_state_dict(_retinaface_state_dict())
    problems = verify_structure(converted, "retinaface")
    assert problems == [], problems[:15]


# --- BiSeNet skeleton -----------------------------------------------------


class _TvBasic(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if cin != cout or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )


def _conv_bn_named(cin, cout, k, s=1, p=None):
    p = k // 2 if p is None else p
    m = tnn.Module()
    m.conv = tnn.Conv2d(cin, cout, k, s, p, bias=False)
    m.bn = tnn.BatchNorm2d(cout)
    return m


def _bisenet_state_dict():
    net = tnn.Module()

    resnet = tnn.Module()
    resnet.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
    resnet.bn1 = tnn.BatchNorm2d(64)
    cin = 64
    for li, (cout, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)], 1):
        setattr(
            resnet,
            f"layer{li}",
            tnn.Sequential(_TvBasic(cin, cout, stride), _TvBasic(cout, cout, 1)),
        )
        cin = cout

    def arm(cin, cout):
        m = tnn.Module()
        m.conv = _conv_bn_named(cin, cout, 3)
        m.conv_atten = tnn.Conv2d(cout, cout, 1, bias=False)
        m.bn_atten = tnn.BatchNorm2d(cout)
        return m

    cp = tnn.Module()
    cp.resnet = resnet
    cp.arm16 = arm(256, 128)
    cp.arm32 = arm(512, 128)
    cp.conv_head32 = _conv_bn_named(128, 128, 3)
    cp.conv_head16 = _conv_bn_named(128, 128, 3)
    cp.conv_avg = _conv_bn_named(512, 128, 1, p=0)
    net.cp = cp

    ffm = tnn.Module()
    ffm.convblk = _conv_bn_named(256, 256, 1, p=0)
    ffm.conv1 = tnn.Conv2d(256, 64, 1, bias=False)
    ffm.conv2 = tnn.Conv2d(64, 256, 1, bias=False)
    net.ffm = ffm

    out = tnn.Module()
    out.conv = _conv_bn_named(256, 256, 3)
    out.conv_out = tnn.Conv2d(256, 19, 1, bias=False)
    net.conv_out = out
    return net.state_dict()


def test_bisenet_structure_roundtrip():
    converted = convert_state_dict(_bisenet_state_dict())
    problems = verify_structure(converted, "bisenet")
    assert problems == [], problems[:15]
