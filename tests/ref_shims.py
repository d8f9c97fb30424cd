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


class TorchBasicBlock(nn.Module):
    """torchvision-compatible ResNet BasicBlock (expansion=1)."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    """Standard torchvision-style ResNet trunk (oracle for parity tests)."""

    def __init__(self, block, depths):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, depths[0], 1)
        self.layer2 = self._make_layer(block, 128, depths[1], 2)
        self.layer3 = self._make_layer(block, 256, depths[2], 2)
        self.layer4 = self._make_layer(block, 512, depths[3], 2)

    def _make_layer(self, block, planes, depth, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride=stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, depth):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x0 = self.layer1(x)
        x1 = self.layer2(x0)
        x2 = self.layer3(x1)
        x3 = self.layer4(x2)
        return [x0, x1, x2, x3]


def make_torch_resnet(num_layers):
    depths = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
              101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
    block = TorchBasicBlock if num_layers in (18, 34) else Bottleneck
    return TorchResNet(block, depths[num_layers])


def randomize_bn_stats(module, seed=0):
    """Give BN layers non-trivial running stats so eval-mode parity is a
    real test rather than mean-0/var-1 passthrough."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d) or isinstance(m, nn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.5)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) + 0.5)


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


def install_open3d_shim():
    """Stub open3d (used only by viz helpers we never execute)."""
    if "open3d" in sys.modules:
        return
    o3d = types.ModuleType("open3d")
    o3d.geometry = types.SimpleNamespace(PointCloud=object,
                                         LineSet=object)
    o3d.utility = types.SimpleNamespace(Vector3dVector=lambda *a: None,
                                        Vector2iVector=lambda *a: None)
    o3d.visualization = types.SimpleNamespace(Visualizer=object)
    sys.modules["open3d"] = o3d


def install_torchvision_shim():
    install_shapely_shim()
    install_open3d_shim()
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_resnet.Bottleneck = Bottleneck
    tv_models.resnet = tv_resnet
    for n in (18, 34, 50, 101, 152):
        setattr(tv_models, f"resnet{n}",
                (lambda n: lambda pretrained=False, **kw:
                 make_torch_resnet(n))(n))
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.resnet"] = tv_resnet
