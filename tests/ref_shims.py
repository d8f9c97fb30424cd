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


# ---------------------------------------------------------------------------
# EfficientNet oracle (efficientnet_pytorch is absent from the image; this
# mirrors its public semantics: TF static SAME padding, swish, SE on input
# channels, BN eps 1e-3, drop-connect off in eval)
# ---------------------------------------------------------------------------


class Conv2dStaticSamePadding(nn.Conv2d):
    """TF-SAME conv: pad computed from the (static) input size, extra on
    right/bottom — efficientnet_pytorch's utils.Conv2dStaticSamePadding
    (an nn.Conv2d subclass, so the weight lives at the module path)."""

    def __init__(self, in_ch, out_ch, kernel, stride=1, groups=1, bias=True,
                 image_size=None):
        super().__init__(in_ch, out_ch, kernel, stride=stride,
                         groups=groups, bias=bias)
        import math as _math

        ih, iw = image_size
        kh, kw = self.kernel_size
        oh, ow = _math.ceil(ih / stride), _math.ceil(iw / stride)
        pad_h = max((oh - 1) * stride + kh - ih, 0)
        pad_w = max((ow - 1) * stride + kw - iw, 0)
        self.static_padding = nn.ZeroPad2d(
            (pad_w // 2, pad_w - pad_w // 2,
             pad_h // 2, pad_h - pad_h // 2))

    def forward(self, x):
        import torch.nn.functional as F

        x = self.static_padding(x)
        return F.conv2d(x, self.weight, self.bias, self.stride,
                        self.padding, self.dilation, self.groups)


class TorchMBConv(nn.Module):
    """efficientnet_pytorch MBConvBlock semantics (eval-path exact)."""

    def __init__(self, in_ch, out_ch, expand, stride, kernel, image_size):
        super().__init__()
        import torch

        self.expand = expand
        self.stride = stride
        self.in_ch, self.out_ch = in_ch, out_ch
        mid = in_ch * expand
        ih, iw = image_size
        if expand != 1:
            self._expand_conv = Conv2dStaticSamePadding(
                in_ch, mid, 1, bias=False, image_size=image_size)
            self._bn0 = nn.BatchNorm2d(mid, eps=1e-3, momentum=0.01)
        self._depthwise_conv = Conv2dStaticSamePadding(
            mid, mid, kernel, stride=stride, groups=mid, bias=False,
            image_size=image_size)
        out_size = (-(-ih // stride), -(-iw // stride))
        self._bn1 = nn.BatchNorm2d(mid, eps=1e-3, momentum=0.01)
        se_ch = max(1, int(in_ch * 0.25))
        self._se_reduce = Conv2dStaticSamePadding(mid, se_ch, 1,
                                                  image_size=(1, 1))
        self._se_expand = Conv2dStaticSamePadding(se_ch, mid, 1,
                                                  image_size=(1, 1))
        self._project_conv = Conv2dStaticSamePadding(
            mid, out_ch, 1, bias=False, image_size=out_size)
        self._bn2 = nn.BatchNorm2d(out_ch, eps=1e-3, momentum=0.01)
        self.swish = lambda t: t * torch.sigmoid(t)
        self.out_size = out_size

    def forward(self, x, drop_connect_rate=None):
        import torch

        inp = x
        if self.expand != 1:
            x = self.swish(self._bn0(self._expand_conv(x)))
        x = self.swish(self._bn1(self._depthwise_conv(x)))
        se = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        se = self._se_expand(self.swish(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.in_ch == self.out_ch:
            if self.training and drop_connect_rate:
                keep = 1.0 - drop_connect_rate
                gate = torch.floor(
                    keep + torch.rand(x.shape[0], 1, 1, 1,
                                      device=x.device))
                x = x / keep * gate
            x = x + inp
        return x


class TorchEfficientNetExtractor(nn.Module):
    """Oracle twin of the reference EfficientNetExtractor (reference
    nuscenes/.../backbones/efficientnet.py:24-96): layers.0 = stem,
    layers.j = j-th MODELS block range; result[0] = stem output;
    requested 'reduction_k' picks result[k-1]."""

    def __init__(self, layer_names, image_height, image_width,
                 model_name="efficientnet-b4"):
        super().__init__()
        import torch

        from cobevt_tpu.nn.efficientnet import (
            _SCALING,
            block_specs,
            reduction_boundaries,
            round_filters,
        )

        bounds = reduction_boundaries(model_name)
        name_to_idx = {n: i for i, (n, _) in enumerate(bounds)}
        idx_max = max(name_to_idx[n] for n in layer_names)
        specs = block_specs(model_name)

        w_mult = _SCALING[model_name][0]
        stem_ch = round_filters(32, w_mult)
        ih, iw = image_height, image_width
        stem = nn.Sequential(
            Conv2dStaticSamePadding(3, stem_ch, 3, stride=2, bias=False,
                                    image_size=(ih, iw)),
            nn.BatchNorm2d(stem_ch, eps=1e-3, momentum=0.01))
        size = (-(-ih // 2), -(-iw // 2))

        layers = [stem]
        for gi in range(1, idx_max + 1):
            _, (lo, hi) = bounds[gi]
            group = []
            for bi in range(lo, hi):
                s = specs[bi]
                group.append(TorchMBConv(s.in_ch, s.out_ch, s.expand,
                                         s.stride, s.kernel, size))
                size = group[-1].out_size
            layers.append(nn.Sequential(*group))
        self.layers = nn.Sequential(*layers)
        self.idx_pick = [name_to_idx[n] for n in layer_names]
        self._drop_rates = [s.drop_rate for s in specs]

        dummy = torch.rand(1, 3, image_height, image_width)
        training = self.training
        self.eval()
        with torch.no_grad():
            self.output_shapes = [tuple(f.shape) for f in self(dummy)]
        self.train(training)

    def forward(self, x):
        import torch

        result = []
        x = self.layers[0](x)
        x = x * torch.sigmoid(x)           # stem swish
        result.append(x)
        for layer in self.layers[1:]:
            for block in layer:
                x = block(x)
            result.append(x)
        return [result[i] for i in self.idx_pick]


def calibrate_bn(module, forward_fn):
    """Set BN running stats to real activation statistics via one
    train-mode forward with momentum=1.

    Random-weight networks with arbitrary running stats saturate within a
    couple of blocks and become input-insensitive (measured: zero output
    delta at EfficientNet reduction_4 for a 0.1-magnitude input change),
    which silently guts a parity test's power.  Calibrated stats keep the
    activations in the sensitive regime so parity failures can surface.
    """
    import torch

    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
            m.momentum = 1.0
    was_training = module.training
    module.train()
    with torch.no_grad():
        forward_fn()
    module.train(was_training)
