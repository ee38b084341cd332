"""Performance-path configuration: explicit, constructor-threaded gates.

Round 3 selected fast paths via os.environ reads INSIDE module forwards.
That was unsound under jit: trace caches do not key on env vars, so
flipping one after the first trace silently did nothing, and scoping a
default by temporarily mutating os.environ during a trace raced against
any concurrent trace in the process (r3 VERDICT weak #3, ADVICE low #2).

Gates now live in an immutable ``PerfConfig`` threaded through model and
op constructors. Environment variables remain honored exactly ONCE, at
entry-point construction time (``PerfConfig.from_env()``, the default for
every model constructor), never inside a traced function. To change a
gate after construction, build a new config and re-perf the module tree
with :func:`with_perf` — a new model object means a new jit cache entry,
which is precisely the semantics env vars could not deliver.

Field notes (measurement provenance in docs/PERF.md):
  fast_decoder      None = on for TPU backends, off elsewhere; the
                    split-conv / packed-up DecoderBlock inference paths.
  fast_max_width    Width cap for those paths. None = the conservative
                    256 default (wide full-frame maps raise peak temp
                    memory; batch-32 FusionNet serving OOMs without the
                    cap). The fused pipeline overrides to its frame width.
  fused_upsample    Phase-decomposed UpConv2d (measured slightly slower
                    than XLA's own fusion on v5e — opt-in).
  fused_pool2       Defer the 1/2-scale ROI pool to LazyColumnWindows and
                    gather-add inside deconv1 (op-level 2x win, neutral-
                    to-slower in the full graph with the slice gather —
                    opt-in; round 4 adds the take gather).
  fused_pool4       Same deferral for the 1/4-scale pool -> deconv2's
                    skip (round 4; the consumption site is the split
                    post-conv, which already handles LazyColumnWindows).
  fused_pool2_pallas  Use the Pallas gather-add kernel for fused_pool2
                    (XLA formulation measured faster in-context).
  int8_tail         int8 packed decoder tail (~5% rel err, breaks 14-bit
                    response parity — opt-in).
  packed_deconv1    Phase-packed deconv1 (measured slower on v5e; tested
                    opt-in).
  packed_tail       Phase-packed deconv0+output0 tail (measured win —
                    default on).
  pool_window_gather  'take' (default; lets XLA's gather emitter write
                    the consumer layout directly; −3.2 ms/frame in the
                    serving graph) or 'slice' (cheaper first compile).
  pallas_crop       Block-DMA window extraction in the variable-bin ROI
                    pool path. None = on for TPU backends.
  pallas_scatter    Pallas quasi-dense scatter kernel. Wins isolated,
                    loses inside the fused serving graph — default off
                    there; drivers opt in per graph.
  decode_chunks     Chunk the per-point patch decode (None = auto
                    threshold at 512 patches).
"""

from __future__ import annotations

import copy
import os
from dataclasses import dataclass, replace
from typing import Optional

FAST_MAX_WIDTH_DEFAULT = 256


@dataclass(frozen=True)
class PerfConfig:
    fast_decoder: Optional[bool] = None
    fast_max_width: Optional[int] = None
    fused_upsample: bool = False
    fused_pool2: bool = False
    fused_pool4: bool = False
    fused_pool2_pallas: bool = False
    fused_pool2_gather: str = 'take'
    int8_tail: bool = False
    packed_deconv1: bool = False
    packed_tail: bool = True
    pool_window_gather: str = 'take'
    pallas_crop: Optional[bool] = None
    # None = per-context default: ON for TPU backends in standalone
    # scatter inference (1.68x over the XLA scatter isolated), OFF inside
    # the fused serving graph (XLA fuses better there)
    pallas_scatter: Optional[bool] = None
    decode_chunks: Optional[int] = None
    # Space-to-depth packed input transport for full-res inference
    # surfaces (ops/s2d_stem.py + ops/packed_stage1.py). Exact; the host
    # loader packs, the stems consume the packed layout. None = on for
    # TPU backends (where the 128-lane padding tax exists), off
    # elsewhere. Frames whose dims don't divide by the factor fall back
    # to unpacked transport. s2d_factor: 4 (48-channel image pack, the
    # measured default) or 2.
    s2d_input: Optional[bool] = None
    s2d_factor: int = 4
    # Keep the packed stage-1 skip packed into the decoder's deconv1
    # (ops/packed_tail.PackedSkip + packed_decoder_block_skippacked,
    # trimmed per-phase kernels at 1.78x FLOPs): skips the lane-padded
    # full-res skip write of the depth_to_space handover. Only active on
    # inference paths that already run the packed stage-1 region.
    # MEASURED SLOWER in the full serving graph (+6.2%, docs/PERF.md
    # round-5 §G: the four per-phase convs re-read the concat tensor) —
    # tested opt-in, like packed_deconv1.
    packed_skip: bool = False

    def __post_init__(self):
        for name in ('pool_window_gather', 'fused_pool2_gather'):
            v = getattr(self, name)
            if v not in ('take', 'slice'):
                raise ValueError(
                    f'{name} must be "take" or "slice", got {v!r}')
        if self.s2d_factor not in (2, 4):
            raise ValueError(
                f's2d_factor must be 2 or 4, got {self.s2d_factor!r}')

    # -- resolved views (backend defaults) --------------------------------

    def fast_decoder_enabled(self) -> bool:
        if self.fast_decoder is not None:
            return self.fast_decoder
        return _tpu_backend()

    def fast_max_width_resolved(self) -> int:
        return (self.fast_max_width if self.fast_max_width is not None
                else FAST_MAX_WIDTH_DEFAULT)

    def s2d_input_enabled(self) -> bool:
        if self.s2d_input is not None:
            return self.s2d_input
        return _tpu_backend()

    def pallas_crop_enabled(self) -> bool:
        if self.pallas_crop is not None:
            return self.pallas_crop
        return _tpu_backend()

    def replace(self, **changes) -> 'PerfConfig':
        return replace(self, **changes)

    @classmethod
    def from_env(cls, **overrides) -> 'PerfConfig':
        """Entry-point defaults: RCFD_* env vars, read ONCE, here.

        Explicit ``overrides`` win over the environment."""
        def flag(name):
            # Common falsy strings disable, truthy strings enable; an
            # unrecognized value raises rather than silently enabling
            # (RCFD_INT8_TAIL=off must never turn ON the int8 tail).
            v = os.environ.get(name)
            if v in (None, ''):
                return None
            low = v.strip().lower()
            if low in ('0', 'false', 'off', 'no'):
                return False
            if low in ('1', 'true', 'on', 'yes'):
                return True
            raise ValueError(
                f'{name}={v!r}: expected one of 0/false/off/no or '
                f'1/true/on/yes')

        env = dict(
            fast_decoder=flag('RCFD_FAST_DECODER'),
            fast_max_width=(int(os.environ['RCFD_FAST_MAX_WIDTH'])
                            if os.environ.get('RCFD_FAST_MAX_WIDTH')
                            else None),
            fused_upsample=flag('RCFD_FUSED_UPSAMPLE') or False,
            fused_pool2=flag('RCFD_FUSED_POOL2') or False,
            fused_pool4=flag('RCFD_FUSED_POOL4') or False,
            fused_pool2_pallas=flag('RCFD_FUSED_POOL2_PALLAS') or False,
            fused_pool2_gather=os.environ.get('RCFD_FUSED_POOL2_GATHER',
                                              'take'),
            int8_tail=flag('RCFD_INT8_TAIL') or False,
            packed_deconv1=flag('RCFD_PACKED_DECONV1') or False,
            packed_tail=(flag('RCFD_PACKED_TAIL')
                         if flag('RCFD_PACKED_TAIL') is not None else True),
            pool_window_gather=os.environ.get('RCFD_POOL_WINDOW_GATHER',
                                              'take'),
            pallas_crop=flag('RCFD_PALLAS_CROP'),
            pallas_scatter=flag('RCFD_PALLAS_SCATTER'),
            decode_chunks=(int(os.environ['RCFD_DECODE_CHUNKS'])
                           if os.environ.get('RCFD_DECODE_CHUNKS')
                           else None),
            s2d_input=flag('RCFD_S2D_INPUT'),
            s2d_factor=(int(os.environ['RCFD_S2D_FACTOR'])
                        if os.environ.get('RCFD_S2D_FACTOR') else 4),
            packed_skip=flag('RCFD_PACKED_SKIP') or False,
        )
        env.update(overrides)
        return cls(**env)


def _tpu_backend() -> bool:
    import jax
    return jax.default_backend() in ('tpu', 'axon')


def with_perf(module, perf: PerfConfig):
    """Deep-copy a module tree and install ``perf`` on every submodule
    that carries one. Params/state live outside modules, so the copy is
    config-only (cheap) and the original keeps its jit caches."""
    from .core import Module

    m = copy.deepcopy(module)
    seen = set()

    def walk(obj):
        if id(obj) in seen:
            return
        seen.add(id(obj))
        # model wrappers (FusionNetModel/RadarNetModel) are not Module
        # subclasses but carry a perf and own Module trees — descend into
        # anything that is a Module or perf-carrying
        if isinstance(obj, Module) or isinstance(
                getattr(obj, 'perf', None), PerfConfig):
            if hasattr(obj, 'perf'):
                obj.perf = perf
            for v in vars(obj).values():
                walk(v)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                walk(v)
        elif isinstance(obj, dict):
            for v in obj.values():
                walk(v)

    walk(m)
    return m


__all__ = ['PerfConfig', 'with_perf', 'FAST_MAX_WIDTH_DEFAULT']
