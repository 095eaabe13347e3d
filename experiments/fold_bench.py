import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time
from pinc_tpu.ops import tiled as tl
from pinc_tpu.ops.pallas_field import fold_global_t
N=128; ts = tl.TileSpec(grid=(N,)*3, T=8, M=1, B=128)
P = ts.P
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.normal(size=(ts.NT, P, P*P)).astype(np.float32))
want = jnp.transpose(tl.fold_to_global(tiles.reshape((ts.NT,)+(P,)*3), ts), (1,0,2))
got = jax.jit(lambda t: fold_global_t(t, ts))(tiles)
err = float(jnp.max(jnp.abs(want-got)))
print('fold max err:', err, flush=True)
def chain(op, x0, REPS=50):
    def body(c,_):
        x,s=c; y=op(x); s2=jnp.sum(y[0,0,:8])
        return (x+0.0*s2, s2),()
    f=jax.jit(lambda x: jax.lax.scan(body,(x,jnp.float32(0)),None,length=REPS)[0][1])
    y=f(x0); jax.block_until_ready(y)
    t0=time.monotonic(); y=f(x0); jax.block_until_ready(y)
    return (time.monotonic()-t0)/REPS*1e3
print('pallas fold_t : %.3f ms' % chain(lambda t: fold_global_t(t, ts), tiles), flush=True)
print('xla fold      : %.3f ms' % chain(lambda t: tl.fold_to_global(t.reshape((ts.NT,)+(P,)*3), ts), tiles), flush=True)
