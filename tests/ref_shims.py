"""Shims that let the read-only reference be imported as a test oracle.

The image lacks torchvision; the reference's FAX module only needs
`torchvision.models.resnet.Bottleneck`.  We register a minimal stand-in
(standard pre-activation-free ResNet bottleneck, public architecture)
under the torchvision module names before importing reference code.
"""

import sys
import types

import torch.nn as nn


class Bottleneck(nn.Module):
    """torchvision-compatible ResNet Bottleneck (expansion=4)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 base_width=64, dilation=1, norm_layer=None):
        super().__init__()
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = norm_layer(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride,
                               padding=dilation, groups=groups,
                               dilation=dilation, bias=False)
        self.bn2 = norm_layer(width)
        self.conv3 = nn.Conv2d(width, planes * self.expansion, 1, bias=False)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def install_shapely_shim():
    """Stub `shapely.geometry.Polygon` — import-time only, never executed."""
    if "shapely" in sys.modules:
        return
    sh = types.ModuleType("shapely")
    sh_geom = types.ModuleType("shapely.geometry")

    class Polygon:  # pragma: no cover - placeholder
        def __init__(self, *a, **k):
            raise RuntimeError("shapely shim: not executable")

    sh_geom.Polygon = Polygon
    sh.geometry = sh_geom
    sys.modules["shapely"] = sh
    sys.modules["shapely.geometry"] = sh_geom


def install_torchvision_shim():
    install_shapely_shim()
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_resnet.Bottleneck = Bottleneck
    tv_models.resnet = tv_resnet
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet
