import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from functools import partial

rng = np.random.default_rng(0)
H, CIN, COUT, F = 2076, 8, 8, 4
x = jnp.asarray(rng.standard_normal((1,H,H,CIN)).astype(np.float32))
w = jnp.asarray(rng.standard_normal((3,3,CIN,COUT)).astype(np.float32))

def pack(x, f=F):
    b,h,w_,c = x.shape
    return x.reshape(b,h//f,f,w_//f,f,c).transpose(0,1,3,2,4,5).reshape(b,h//f,w_//f,f*f*c)

def lift_kernel(w, f=F):
    kh,kw,cin,cout = w.shape
    wp = np.zeros((3,3,f*f*cin,f*f*cout), np.float32)
    wn = np.asarray(w)
    for oy in range(f):
      for ox in range(f):
        for ky in range(kh):
          for kx in range(kw):
            ry, rx = oy+ky-1, ox+kx-1
            dy, iy = ry//f, ry%f
            dx, ix = rx//f, rx%f
            wp[dy+1,dx+1,(iy*f+ix)*cin:(iy*f+ix+1)*cin,(oy*f+ox)*cout:(oy*f+ox+1)*cout] += wn[ky,kx]
    return jnp.asarray(wp)

wp = lift_kernel(w).astype(jnp.bfloat16)
xp = pack(x).astype(jnp.bfloat16)
xb = x.astype(jnp.bfloat16)
wb = w.astype(jnp.bfloat16)

def chain(conv, x, w, n=20):
    for _ in range(n):
        x = conv(x, w).astype(x.dtype)
    return jnp.sum(x.astype(jnp.float32))

conv_nhwc = lambda a,b: lax.conv_general_dilated(a,b,(1,1),((1,1),(1,1)),dimension_numbers=('NHWC','HWIO','NHWC'),preferred_element_type=jnp.float32)

def timeit(name, f, *a, n=3):
    s = float(f(*a))
    t0=time.time()
    for _ in range(n): s = float(f(*a))
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

timeit("20x conv ref 8->8 @2076^2", jax.jit(partial(chain, conv_nhwc)), xb, wb)
timeit("20x conv packed 128->128 @519^2", jax.jit(partial(chain, conv_nhwc)), xp, wp)
# pack/unpack relayout cost
timeit("20x pack+sum roundtrip", jax.jit(lambda v: sum(jnp.sum(pack(v)) for _ in range(20))), x)
