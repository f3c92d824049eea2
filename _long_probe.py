import time, numpy as np, jax, jax.numpy as jnp
from rainier_tpu.sampler import identity_mass
from rainier_tpu.sampler.leapfrog import ChainState, hmc_transition

N_CHAINS, N_ITERS, N_STEPS = 32768, 3_000_000, 5

def lpg(q):
    f = lambda qq: -0.5*(qq[0]/3.0)**2 - 0.5*jnp.sum(qq[1:]*qq[1:]*jnp.exp(-qq[0])) - 4.5*qq[0]
    return f(q), jax.grad(f)(q)

def chain_run(key, q0):
    lp, g = lpg(q0)
    state = ChainState(q=q0, potential=-lp, grad=g)
    def step(carry, _):
        key, state = carry
        key, k = jax.random.split(key)
        res = hmc_transition(k, state, jnp.float32(0.18), N_STEPS, identity_mass(), lpg)
        return (key, res.state), None
    (_, state), _ = jax.lax.scan(step, (key, state), None, length=N_ITERS)
    return state.q

run = jax.jit(lambda keys, q0: jnp.sum(jax.vmap(chain_run)(keys, q0)))
keys = jax.random.split(jax.random.PRNGKey(0), N_CHAINS)
t0=time.time(); v = float(run(keys, jnp.zeros((N_CHAINS,10),jnp.float32)))
print("ok", time.time()-t0, v)
