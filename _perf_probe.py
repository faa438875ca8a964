import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from popcorn_tpu.data.normalize import NormStats, normalize_and_assemble, photometric_s2_traced
from popcorn_tpu.nn.popcorn import reorder_to_dda
from popcorn_tpu.nn import packed as pk

stats = NormStats()
rng = np.random.default_rng(0)
H = 2048
s2 = jax.device_put(rng.uniform(0,4000,(1,H,H,4)).astype(np.float32))
s1 = jax.device_put(rng.uniform(-25,0,(1,H,H,2)).astype(np.float32))
s2cf = jax.device_put(rng.uniform(0,4000,(1,4,H,H)).astype(np.float32))
s1cf = jax.device_put(rng.uniform(-25,0,(1,2,H,H)).astype(np.float32))
ph = jax.device_put(np.asarray([1.0,1.2,1.0,0.9], np.float32))

def t(name, f, *a, n=6):
    r=f(*a); _=float(jnp.sum(jax.tree.leaves(r)[0]))
    t0=time.time()
    for _i in range(n): r=f(*a); _=float(jnp.sum(jax.tree.leaves(r)[0]))
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

def nhwc_path(s2, s1, ph):
    x = normalize_and_assemble({"S2": photometric_s2_traced(s2, ph), "S1": s1}, stats)
    x6 = reorder_to_dda(x, s1=True, s2=True, nir=True)
    return pk.pack(x6[..., :2], 4), pk.pack(x6[..., 2:], 4)

def cf_path(s2cf, s1cf, ph):
    # photometric CF: channel axis=1
    s2max = 10000.0
    xb = jnp.clip(s2cf / s2max * ph[1], 0, 1) * s2max
    x = jnp.where(ph[0] > 0.5, xb, s2cf)
    x01 = jnp.clip(x, 0, None) / s2max
    xg = jnp.clip(x01 ** ph[3], 0, 1) * s2max
    s2a = jnp.where(ph[2] > 0.5, xg, x)
    m2 = jnp.asarray(stats.s2nir_mean).reshape(1,4,1,1); d2 = jnp.asarray(stats.s2nir_std).reshape(1,4,1,1)
    m1 = jnp.asarray(stats.s1_mean).reshape(1,2,1,1); d1 = jnp.asarray(stats.s1_std).reshape(1,2,1,1)
    s2n = (s2a - m2) / d2
    s1n = (s1cf - m1) / d1
    # dda order [VV,VH | B,G,R,NIR]; our CF s2 channels [R,G,B,NIR]
    sar = s1n
    opt = jnp.stack([s2n[:,2], s2n[:,1], s2n[:,0], s2n[:,3]], 1)
    def pack_cf(x, f):
        b,c,h,w = x.shape
        x = x.reshape(b,c,h//f,f,w//f,f)
        return x.transpose(0,2,4,3,5,1).reshape(b,h//f,w//f,f*f*c)
    return pack_cf(sar,4), pack_cf(opt,4)

t("NHWC input path -> packed", jax.jit(nhwc_path), s2, s1, ph)
t("CF   input path -> packed", jax.jit(cf_path), s2cf, s1cf, ph)
# verify equality (same data arranged differently)
a = jax.jit(nhwc_path)(jnp.transpose(s2cf,(0,2,3,1)), jnp.transpose(s1cf,(0,2,3,1)), ph)
b = jax.jit(cf_path)(s2cf, s1cf, ph)
print("sar equal:", bool(jnp.allclose(a[0], b[0], rtol=1e-5, atol=1e-4)),
      "opt equal:", bool(jnp.allclose(a[1], b[1], rtol=1e-5, atol=1e-4)), flush=True)
