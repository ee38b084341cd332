"""HBM-bandwidth roofline for the serving graphs (VERDICT r4 #2).

Quantifies how close the measured throughput is to the memory-bound
ceiling of the chip, closing (or reopening) the BASELINE north star's
"speed-of-light" claim with numbers instead of qualitative arguments.

Two byte accountings, bracketing the truth:
  analytic  — every conv/pool/resize op's input+weight read and output
              write, recorded by intercepting rcfd_tpu.nn.functional
              during an abstract trace (jax.eval_shape: no compile, no
              device). This assumes PERFECT fusion (elementwise ops ride
              along free, nothing spills) — a LOWER bound on HBM traffic.
  xla       — compiled.cost_analysis()['bytes accessed']: XLA's cost
              model counts each HLO's operands at full size with no
              cross-fusion reuse — an UPPER estimate.
plus a third, 128-lane PADDED analytic accounting (C<128 NHWC buffers
move ceil(C/128)*128 lanes — the measured layout tax, docs/PERF.md
round-2), which is the layout-imposed memory floor of THIS graph as XLA
lays it out today.

achieved GB/s = bytes / measured_time; % of peak uses the v5e datasheet
numbers (819 GB/s HBM, 197 bf16 TFLOP/s MXU). If analytic-bound
utilization is high (>=70%), the graph is memory-bound at speed of
light; if both bounds are low, there is real headroom and the top
traffic rows name where.

Usage (real chip):
  python tools/roofline.py --graph fusionnet_b32           # bench scan body
  python tools/roofline.py --graph pipeline_k64 --batch 4  # fused 2-stage
Writes a markdown table to stdout and one JSON line at the end.
"""

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault('RCFD_COMPILE_CACHE', os.path.join(REPO, '.xla_cache'))
os.environ.setdefault('RCFD_COMPILE_CACHE_MIN_SECS', '2')

# v5e (TPU v5 lite) datasheet
HBM_PEAK_GBPS = 819.0
MXU_PEAK_TFLOPS_BF16 = 197.0


@contextlib.contextmanager
def record_ops(records):
    """Intercept nn.functional's compute ops during an abstract trace and
    record (name, bytes_in, bytes_w, bytes_out, flops) per call."""
    from rcfd_tpu.nn import functional as NF

    def nbytes(a):
        return int(np.prod(a.shape)) * a.dtype.itemsize

    orig = {}

    def wrap(name, flops_fn=None, has_weight=True):
        fn = getattr(NF, name)
        orig[name] = fn

        def wrapped(x, *args, **kwargs):
            out = fn(x, *args, **kwargs)
            w = args[0] if (has_weight and args) else None
            flops = flops_fn(x, w, out) if flops_fn else 0
            records.append(dict(
                op=name,
                in_shape=tuple(x.shape), out_shape=tuple(out.shape),
                bytes_in=nbytes(x),
                bytes_w=nbytes(w) if w is not None else 0,
                bytes_out=nbytes(out),
                flops=int(flops)))
            return out

        setattr(NF, name, wrapped)

    def conv_flops(x, w, out):
        # out elems * 2 * kh * kw * Cin MACs
        kh, kw, cin = w.shape[0], w.shape[1], w.shape[2]
        return 2 * int(np.prod(out.shape)) * kh * kw * cin

    def deconv_flops(x, w, out):
        # transpose conv: every INPUT element multiplies the full kernel
        kh, kw = w.shape[0], w.shape[1]
        cout = out.shape[-1]
        return 2 * int(np.prod(x.shape)) * kh * kw * cout

    wrap('conv2d', conv_flops)
    wrap('upsample2x_conv2d', conv_flops)
    wrap('conv_transpose2d', deconv_flops)
    wrap('max_pool2d', None, has_weight=False)
    wrap('min_pool2d', None, has_weight=False)
    wrap('resize_nearest', None, has_weight=False)
    wrap('resize_bilinear_align_corners', None, has_weight=False)
    try:
        yield
    finally:
        for name, fn in orig.items():
            setattr(NF, name, fn)


def build_fusionnet_b32(batch, dtype):
    """The bench scan-graph body: canonical FusionNet full-res forward.

    Returns (forward, make_loop, args, n_frames): `forward` is the
    single-call graph (abstract trace + XLA cost model); `make_loop(n)`
    is an on-device lax.scan of n chained forwards whose scalar result
    must be fetched to the host — the same timing discipline bench.py
    uses, because through the axon relay per-dispatch overhead is
    ~100+ ms and block_until_ready does not force execution.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rcfd_tpu.models import FusionNetModel
    from rcfd_tpu.nn.core import cast_tree
    from rcfd_tpu.nn.optimize import fold_batch_norm

    sys.path.insert(0, REPO)
    import bench

    model = FusionNetModel(**bench.CONFIG)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state = jax.jit(fold_batch_norm)(params, state)
    cdtype = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32
    params = cast_tree(params, cdtype)
    state = cast_tree(state, cdtype)

    def decode(image, depth, response):
        image = image.astype(cdtype) * cdtype(1.0 / 255.0)
        depth = depth.astype(cdtype) * cdtype(1.0 / 256.0)
        response = response.astype(cdtype) * cdtype(1.0 / 256.0)
        return image, depth, response

    def forward(p, s, image, depth, response):
        image, depth, response = decode(image, depth, response)
        input_depth = jnp.concatenate([depth, response], axis=-1)
        out, _ = model.apply(p, s, image, input_depth, training=False)
        return out.astype(jnp.float32)

    def make_loop(n):
        @jax.jit
        def loop(p, s, image, depth, response):
            image, depth, response = decode(image, depth, response)
            input_depth = jnp.concatenate([depth, response], axis=-1)

            def body(img, _):
                out, _ = model.apply(p, s, img, input_depth,
                                     training=False)
                # serialize iterations without changing the numerics
                return img + out.astype(img.dtype) * 1e-12, ()

            img, _ = lax.scan(body, image, None, length=n)
            return img[0, 0, 0, 0].astype(jnp.float32)

        return loop

    rng = np.random.default_rng(0)
    image, depth, response = bench._inputs(batch, rng)
    args = (params, state, image, depth, response)
    n_frames = batch
    return forward, make_loop, args, n_frames


def build_pipeline_k64(batch, dtype, k=64):
    """The fused two-stage serving graph at K points per frame."""
    import jax
    import jax.numpy as jnp
    from rcfd_tpu.models import FusionNetModel, RadarNetModel
    from rcfd_tpu.pipeline import TwoStagePipeline

    rn = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(900, 288),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 128, 128],
        n_neurons_encoder_depth=[32, 64, 128, 128, 128],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[256, 128, 64, 32, 16])
    fn = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 256, 256, 256],
        n_filters_encoder_depth=[16, 32, 64, 128, 128, 128],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm', n_resolution_decoder=1,
        n_filters_decoder=[256, 256, 128, 64, 64, 32],
        min_predict_depth=1.0, max_predict_depth=100.0)
    import jax as _jax
    rn_vars = _jax.jit(rn.init)(_jax.random.PRNGKey(0))
    fn_vars = _jax.jit(fn.init)(_jax.random.PRNGKey(1))
    pipe = TwoStagePipeline(
        rn, fn, rn_vars, fn_vars, 900, 1600, optimize=True,
        compute_dtype=jnp.bfloat16 if dtype == 'bfloat16' else None)

    fwd = pipe._build_forward_batched()

    def forward(rn_p, rn_s, fn_p, fn_s, images, points, valid):
        return fwd(rn_p, rn_s, fn_p, fn_s, images, points, valid)

    def make_loop(n):
        from jax import lax

        @_jax.jit
        def loop(rn_p, rn_s, fn_p, fn_s, images, points, valid):
            def body(pts, _):
                dense, _, _ = fwd(rn_p, rn_s, fn_p, fn_s, images, pts,
                                  valid)
                # serialize iterations: feed an invisible perturbation of
                # the output back into the point depths
                eps = dense[:, 0, 0][:, None] * 1e-12
                return pts.at[..., 2].add(eps), ()

            pts, _ = lax.scan(body, points, None, length=n)
            return pts[0, 0, 2].astype(jnp.float32)

        return loop

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (batch, 900, 1600, 3), dtype=np.uint8)
    points = np.stack([
        rng.integers(0, 1600, (batch, k)).astype(np.float32),
        rng.integers(0, 900, (batch, k)).astype(np.float32),
        rng.random((batch, k), np.float32) * 70 + 1], axis=-1)
    valid = np.ones((batch, k), bool)
    args = (pipe.radarnet_params, pipe.radarnet_state,
            pipe.fusionnet_params, pipe.fusionnet_state,
            images, points, valid)
    return forward, make_loop, args, batch


def stage_of(rec, idx, total):
    """Coarse stage label from the op order and shapes (the module call
    order is deterministic: image/depth encoders interleave per scale,
    then the decoder walks back up)."""
    h = rec['out_shape'][-3] if len(rec['out_shape']) >= 3 else 0
    name = rec['op']
    if name in ('resize_nearest', 'resize_bilinear_align_corners'):
        return 'decoder/upsample'
    kind = 'decoder' if idx > total * 0.45 and name in (
        'conv2d', 'upsample2x_conv2d', 'conv_transpose2d') else 'encoder'
    return f'{kind}/h{h}'


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--graph', choices=['fusionnet_b32', 'pipeline_k64'],
                        default='fusionnet_b32')
    parser.add_argument('--batch', type=int, default=None)
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['bfloat16', 'float32'])
    parser.add_argument('--n_iters', type=int, default=10)
    parser.add_argument('--k', type=int, default=64)
    parser.add_argument('--dry', action='store_true',
                        help='analytic accounting only (no compile, no '
                             'device) — CI smoke')
    args = parser.parse_args()

    import jax

    if args.graph == 'fusionnet_b32':
        batch = args.batch or 32
        forward, make_loop, fargs, n_frames = build_fusionnet_b32(
            batch, args.dtype)
    else:
        batch = args.batch or 4
        forward, make_loop, fargs, n_frames = build_pipeline_k64(
            batch, args.dtype, k=args.k)

    # ---- analytic per-op accounting over an abstract trace --------------
    records = []
    with record_ops(records):
        jax.eval_shape(forward, *fargs)

    def padded_nbytes(shape, itemsize=2):
        # 128-lane channel padding: C<128 NHWC buffers move
        # ceil(C/128)*128 lanes of traffic (measured for C=32,
        # docs/PERF.md round-2 "128-lane channel padding"; assumed for
        # other C — the C<=3 model inputs may be special-cased by XLA,
        # which tools/stemprobe.py tests directly)
        if not shape:
            return itemsize
        lane = -(-shape[-1] // 128) * 128
        return int(np.prod(shape[:-1])) * lane * itemsize

    total = len(records)
    by_stage = {}
    for i, r in enumerate(records):
        key = stage_of(r, i, total)
        agg = by_stage.setdefault(key, dict(bytes=0, padded=0, flops=0,
                                            n=0))
        agg['bytes'] += r['bytes_in'] + r['bytes_w'] + r['bytes_out']
        agg['padded'] += (padded_nbytes(r['in_shape'])
                          + padded_nbytes(r['out_shape']) + r['bytes_w'])
        agg['flops'] += r['flops']
        agg['n'] += 1
    analytic_bytes = sum(v['bytes'] for v in by_stage.values())
    padded_bytes = sum(v['padded'] for v in by_stage.values())
    analytic_flops = sum(v['flops'] for v in by_stage.values())

    if args.dry:
        print(json.dumps({
            'graph': args.graph, 'batch': batch, 'dry': True,
            'n_ops': total,
            'analytic_bytes': analytic_bytes,
            'padded_bytes': padded_bytes,
            'analytic_flops': analytic_flops}))
        return

    # ---- compile + XLA cost model ---------------------------------------
    jitted = jax.jit(forward)
    lowered = jitted.lower(*fargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla_bytes = float(ca.get('bytes accessed', float('nan')))
    xla_flops = float(ca.get('flops', float('nan')))

    # ---- measured time ---------------------------------------------------
    # On-device lax.scan of n chained calls with a scalar host fetch —
    # the same discipline as bench.py's scan mode. Per-dispatch relay
    # overhead is ~100+ ms and block_until_ready does not force
    # execution through the axon relay, so naive per-call timing is
    # wrong in both directions.
    dev_args = jax.device_put(fargs)
    loop = make_loop(args.n_iters)
    v = float(loop(*dev_args))  # compile + warm
    assert np.isfinite(v)

    def run():
        t0 = time.perf_counter()
        v = float(loop(*dev_args))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    dt = min(run() for _ in range(3)) / args.n_iters

    # ---- report -----------------------------------------------------------
    def gbps(nbytes):
        return nbytes / dt / 1e9

    print(f'\n# Roofline — {args.graph} batch={batch} {args.dtype} '
          f'({jax.devices()[0].platform})\n')
    print(f'measured: {dt * 1e3:.2f} ms/call, '
          f'{n_frames / dt:.1f} frames/s\n')
    print('| stage | ops | GB moved (analytic) | share | GB (128-lane '
          'padded) | GFLOP |')
    print('|---|---|---|---|---|---|')
    for key in sorted(by_stage, key=lambda k: -by_stage[k]['padded']):
        v = by_stage[key]
        print('| {} | {} | {:.3f} | {:.1%} | {:.3f} | {:.1f} |'.format(
            key, v['n'], v['bytes'] / 1e9,
            v['bytes'] / analytic_bytes, v['padded'] / 1e9,
            v['flops'] / 1e9))
    print()
    rows = [
        ('analytic lower bound', analytic_bytes, analytic_flops),
        ('analytic, 128-lane padded', padded_bytes, analytic_flops),
        ('xla cost model', xla_bytes, xla_flops),
    ]
    print('| accounting | bytes/call | achieved GB/s | % HBM peak '
          '| TFLOP/s | % MXU peak |')
    print('|---|---|---|---|---|---|')
    for name, b, f in rows:
        print('| {} | {:.2f} GB | {:.0f} | {:.1%} | {:.1f} | {:.1%} |'
              .format(name, b / 1e9, gbps(b), gbps(b) / HBM_PEAK_GBPS,
                      f / dt / 1e12,
                      (f / dt / 1e12) / MXU_PEAK_TFLOPS_BF16))
    print()
    print(json.dumps({
        'graph': args.graph, 'batch': batch, 'dtype': args.dtype,
        'backend': jax.devices()[0].platform,
        'ms_per_call': round(dt * 1e3, 3),
        'frames_per_s': round(n_frames / dt, 3),
        'analytic_bytes': analytic_bytes,
        'padded_bytes': padded_bytes,
        'xla_bytes': xla_bytes,
        'analytic_gbps': round(gbps(analytic_bytes), 2),
        'padded_gbps': round(gbps(padded_bytes), 2),
        'xla_gbps': round(gbps(xla_bytes), 2),
        'pct_hbm_peak_analytic': round(
            gbps(analytic_bytes) / HBM_PEAK_GBPS, 4),
        'pct_hbm_peak_padded': round(
            gbps(padded_bytes) / HBM_PEAK_GBPS, 4),
        'pct_hbm_peak_xla': round(gbps(xla_bytes) / HBM_PEAK_GBPS, 4),
        'analytic_flops': analytic_flops,
        'tflops': round(analytic_flops / dt / 1e12, 2),
        'pct_mxu_peak': round(
            analytic_flops / dt / 1e12 / MXU_PEAK_TFLOPS_BF16, 4),
    }))


if __name__ == '__main__':
    main()
