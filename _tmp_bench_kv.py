import subprocess, sys, time
probe = subprocess.run([sys.executable, "-c", "import jax; jax.devices()"],
                       timeout=180, capture_output=True)
if probe.returncode != 0:
    print("tunnel down"); sys.exit(3)
import numpy as np, jax, jax.numpy as jnp
from kmerind_tpu.index import store as st
CAP = 1 << 24
N = 1 << 24
W = 2
rng = np.random.default_rng(0)
live = CAP // 2
keys = np.full((CAP, W), 0xFFFFFFFF, np.uint32)
keys[:live, 0] = np.sort(rng.integers(0, 1 << 26, size=live).astype(np.uint32))
kstore = st.KVStore(keys=jnp.asarray(keys),
                    val_hi=jnp.asarray(rng.integers(0, 1 << 31, size=CAP).astype(np.uint32)),
                    val_lo=jnp.asarray(rng.integers(0, 1 << 31, size=CAP).astype(np.uint32)),
                    size=jnp.asarray(live, jnp.int32))
bstore = st.BimolStore(keys=jnp.asarray(keys),
                       counts=jnp.asarray(np.ones(CAP, np.int32)),
                       rep_hi=jnp.asarray(np.zeros(CAP, np.uint32)),
                       rep_lo=jnp.asarray(np.zeros(CAP, np.uint32)),
                       rep_strand=jnp.asarray(np.zeros(CAP, np.uint8)),
                       size=jnp.asarray(live, jnp.int32))
bw = np.zeros((N, W), np.uint32)
bw[:, 0] = rng.integers(0, 1 << 26, size=N).astype(np.uint32)
bwj = jnp.asarray(bw)
valid = jnp.asarray(np.ones(N, bool))
hi = jnp.asarray(rng.integers(0, 1 << 31, size=N).astype(np.uint32))
lo = jnp.asarray(rng.integers(0, 1 << 31, size=N).astype(np.uint32))
strand = jnp.asarray(np.zeros(N, np.uint8))
wts = jnp.asarray(np.ones(N, np.int32))

def timeit(fn, *a, label=""):
    t0 = time.perf_counter()
    out = fn(*a)
    np.asarray(out[0].keys[:2, :].sum())
    tf = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(out[0].keys[:2, :].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{label}: first {tf:.1f}s, warm {min(ts)*1e3:.1f} ms", flush=True)

timeit(jax.jit(lambda s,w,h,l,v: st.kv_insert(s,w,h,l,v,reduce='first')),
       kstore, bwj, hi, lo, valid, label="kv_insert first 16M+16M")
timeit(jax.jit(lambda s,w,h,l,v: st.kv_insert(s,w,h,l,v,reduce='min')),
       kstore, bwj, hi, lo, valid, label="kv_insert min   16M+16M")
timeit(jax.jit(st.bimol_insert),
       bstore, bwj, wts, hi, lo, strand, valid, label="bimol_insert    16M+16M")
