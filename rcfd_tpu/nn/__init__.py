from . import functional
from .core import (Module, Sequential, Params, State, init_children,
                   tree_size, cast_tree, flatten_tree, unflatten_tree)
from .perf import PerfConfig, with_perf
from .layers import (BatchNorm2d, Conv2d, TransposeConv2d, UpConv2d,
                     FullyConnected, ResNetBlock, ResNetBottleneckBlock,
                     VGGNetBlock, DecoderBlock)
