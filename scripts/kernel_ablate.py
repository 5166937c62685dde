"""Throwaway ablation probe for the pair-pool kernel's per-tile costs."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.ops import pair_features as pf

B, N, P, G = 8, 1024, 32, 8
C = pf.NUM_COLUMNS
MODE = sys.argv[1] if len(sys.argv) > 1 else "full"
TI = int(sys.argv[2]) if len(sys.argv) > 2 else 128
TJ = int(sys.argv[3]) if len(sys.argv) > 3 else 128
BF = True

def kernel(colsT_ref, cols_ref, aT_ref, bT_ref, wgT_ref, w2T_ref, b2_ref, out_ref):
    j = pl.program_id(2)
    ti, tj, p = TI, TJ, P
    mm = jnp.bfloat16 if BF else jnp.float32
    colsT_t, cols_t = colsT_ref[0], cols_ref[0]
    aT_t, bT_t = aT_ref[0], bT_ref[0]
    ci = pf.DetColumns(*[colsT_t[:, k:k+1] for k in range(C)])
    cj = pf.DetColumns(*[cols_t[k:k+1, :] for k in range(C)])
    if MODE == "nofeat":
        iou = (ci.x1 + cj.x1) * 0.001  # cheap stand-in, keeps shapes
        feats = [iou] * G
    else:
        iou = pf.pair_iou(ci, cj)
        feats = pf.pair_feature_list(ci, cj, iou=iou)
    if MODE == "nogw":
        gw = jnp.zeros((p, ti, tj), jnp.float32)
    else:
        g_stack = jnp.concatenate([g.reshape(1, ti*tj) for g in feats], axis=0)
        gw = jax.lax.dot_general(wgT_ref[:].astype(mm), g_stack.astype(mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(p, ti, tj)
    if MODE == "bf3d":
        u1 = (aT_t.astype(jnp.bfloat16)[:, :, None]
              + bT_t.astype(jnp.bfloat16)[:, None, :] + gw.astype(jnp.bfloat16))
        h1 = jnp.maximum(u1, jnp.bfloat16(0))
        h1_2d = h1.reshape(p, ti*tj)
        pre2 = (jax.lax.dot_general(w2T_ref[:].astype(mm), h1_2d,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            + b2_ref[:].astype(jnp.bfloat16))
        h2 = jnp.maximum(pre2, jnp.bfloat16(0)).reshape(p, ti, tj)
        neighbor = (iou >= 0.2) & (ci.valid > 0.0) & (cj.valid > 0.0)
        masked = jnp.where(neighbor[None, :, :], h2, jnp.bfloat16(-1e30))
        tile_max = jnp.max(masked, axis=2).astype(jnp.float32)
    else:
        u1 = aT_t[:, :, None] + bT_t[:, None, :] + gw
        h1 = jnp.maximum(u1, 0.0)
        if MODE == "nofc2":
            h2 = h1
        else:
            h1_2d = h1.reshape(p, ti*tj)
            pre2 = jax.lax.dot_general(w2T_ref[:].astype(mm), h1_2d.astype(mm),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b2_ref[:]
            h2 = jnp.maximum(pre2, 0.0).reshape(p, ti, tj)
        if MODE == "nomask":
            tile_max = jnp.max(h2, axis=2)
        else:
            neighbor = (iou >= 0.2) & (ci.valid > 0.0) & (cj.valid > 0.0)
            masked = jnp.where(neighbor[None, :, :], h2, -1e30)
            tile_max = jnp.max(masked, axis=2)
    @pl.when(j == 0)
    def _():
        out_ref[0] = tile_max
    @pl.when(j > 0)
    def _():
        out_ref[0] = jnp.maximum(out_ref[0], tile_max)

def pool(colsT, cols, aT, bT, wgT, w2T, b2c):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, P, N), jnp.float32),
        grid=(B, N//TI, N//TJ),
        in_specs=[
            pl.BlockSpec((1, TI, C), lambda b,i,j: (b,i,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TJ), lambda b,i,j: (b,0,j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, TI), lambda b,i,j: (b,0,i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, TJ), lambda b,i,j: (b,0,j), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, G), lambda b,i,j: (0,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda b,i,j: (0,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda b,i,j: (0,0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, TI), lambda b,i,j: (b,0,i), memory_space=pltpu.VMEM),
    )(colsT, cols, aT, bT, wgT, w2T, b2c)

rng = np.random.default_rng(0)
xy = rng.uniform(0, 600, (B, N, 2)); wh = rng.uniform(20, 80, (B, N, 2))
boxes = jnp.asarray(np.concatenate([xy, xy+wh], -1).astype(np.float32))
scores = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))
valid = jnp.ones((B, N), bool)
cols = pf.stack_columns(pf.det_columns(boxes, scores, valid))
colsT = jnp.swapaxes(cols, 1, 2)
aT = jnp.asarray(rng.normal(0, 1, (B, P, N)).astype(np.float32))
bT = jnp.asarray(rng.normal(0, 1, (B, P, N)).astype(np.float32))
wgT = jnp.asarray(rng.normal(0, .3, (P, G)).astype(np.float32))
w2T = jnp.asarray(rng.normal(0, .3, (P, P)).astype(np.float32))
b2c = jnp.asarray(rng.normal(0, .3, (P, 1)).astype(np.float32))

f = jax.jit(lambda aT: pool(colsT, cols, aT, bT, wgT, w2T, b2c))
x = aT
float(jnp.sum(f(x)))
K = 40
t0 = time.perf_counter()
for _ in range(K):
    x = f(x)  # chain: out [B,P,N] feeds aT [B,P,N]
s = float(jnp.sum(x))
dt = (time.perf_counter()-t0)/K
ntiles = B*(N//TI)*(N//TJ)
print(f"MODE={MODE} TI={TI} TJ={TJ} BF={BF}: {dt*1e3:.2f} ms/call, {dt/ntiles*1e6:.2f} us/tile (sum={s:.1f})", flush=True)
