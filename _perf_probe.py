import time, numpy as np, jax, jax.numpy as jnp
from popcorn_tpu.compat.torch_convert import load_dda_tree
from popcorn_tpu.nn import packed as pk
from popcorn_tpu.nn.init import init_head

params, bn = load_dda_tree()
x = jnp.asarray(np.random.default_rng(0).standard_normal((1,2048,2048,6)).astype(np.float32))
BF = jnp.bfloat16

def t(name, f, *a):
    t0=time.time(); s=float(jnp.sum(f(*a))); c=time.time()-t0
    t0=time.time()
    for _ in range(3): s=float(jnp.sum(f(*a)))
    print(f"{name}: compile {c:.1f}s, run {(time.time()-t0)/3*1000:.1f} ms", flush=True)

feats_fn = jax.jit(lambda x: pk.packed_dual_stream_features(params, bn, x, 4, dtype=BF))
t("packed dual features 2048", feats_fn, x)
feats = feats_fn(x)
head = init_head(jax.random.PRNGKey(0))
t("packed head", jax.jit(lambda f_: pk.packed_head_apply(head, f_, 4, BF)), feats)
t("packed builder logits (2076 pad)", jax.jit(lambda x: pk.packed_building_logits(params, bn, jnp.pad(x, ((0,0),(14,14),(14,14),(0,0)), mode='reflect'), 4, dtype=BF)), x)
