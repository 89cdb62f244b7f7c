import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.cache/xla')
from cuda_volpath_tpu.config import RenderSettings
from cuda_volpath_tpu.render import film as filmmod, integrator
from cuda_volpath_tpu import scenes

t0 = time.time()
scene, cam, param = scenes.flagship(n=256)
print(f'scene ready {time.time()-t0:.0f}s bound {scene.bound.data.shape}',
      flush=True)
W, H = 960, 512
npix = W * H
pool = 1 << 20
for po in [True, False]:
    settings = RenderSettings(steps_per_launch=32, precompute_opacity=po)
    _, launch = integrator.make_step_fn(settings, cam, W, H)
    st = integrator.init_state(pool)
    st = st.replace(total_items=jnp.full((1,), npix * 100000, jnp.int32))
    film = filmmod.make_film(W, H)
    t0 = time.time()
    st, film = launch(scene, st, film)
    float(jnp.sum(film.count[:-1]))
    print(f'opacity={po}: compile+first {time.time()-t0:.0f}s', flush=True)
    for _ in range(6):
        st, film = launch(scene, st, film)
    r0 = float(jnp.sum(film.count[:-1]))
    t0 = time.time(); n = 0
    while time.time() - t0 < 15:
        st, film = launch(scene, st, film)
        float(jnp.sum(film.count[:-1]))
        n += 1
    r1 = float(jnp.sum(film.count[:-1]))
    dt = time.time() - t0
    print(f'  {dt/n*1e3:.0f} ms/launch  {pool*32*n/dt/1e6:.1f}M lane-steps/s  '
          f'{(r1-r0)/dt/1e6:.4f}M samples/s  steps/sample '
          f'{pool*32*n/max(r1-r0,1):.0f}', flush=True)
    stt = np.asarray(st.status); sh = np.asarray(st.shadow)
    print('  status', np.bincount(stt, minlength=4)[:4],
          'shadow', sh.sum(), flush=True)
    hm = np.asarray(filmmod.heat(film))
    sp = np.asarray(filmmod.spp(film))
    m = sp > 0
    print('  mean heat', hm[m].mean(), flush=True)
