"""Profile KeyCorridorS6R3 _gen_grid at batch 4096 on the chip."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import minigrid_tpu
from minigrid_tpu.core import roomgrid as RG

env = minigrid_tpu.make("MiniGrid-KeyCorridorS6R3-v0").packed()
B = 4096

f = jax.jit(lambda k: jax.vmap(env._gen_grid)(jax.random.split(k, B)))
t0 = time.perf_counter(); s = f(jax.random.PRNGKey(0)); jax.block_until_ready(s.grid)
print("compile+run:", time.perf_counter()-t0)
t0 = time.perf_counter()
for i in range(3):
    s = f(jax.random.PRNGKey(i+1)); jax.block_until_ready(s.grid)
dt = (time.perf_counter()-t0)/3
print(f"gen batch {B}: {dt*1e3:.1f} ms/call = {dt/B*1e6:.1f} us/layout")

# stagewise: how much is connect_all?
L = env.layout
def gen_no_connect(key):
    # replicate _gen_grid but skip connect_all
    keys = jax.random.split(key, 9)
    b = RG.init_builder(L, keys[0])
    for j in range(1, L.num_rows):
        b = RG.remove_wall(b, L, 1, j, 3)
    room_j = jax.random.randint(keys[1], (), 0, L.num_rows)
    b, door_color, _ = RG.add_door(b, L, keys[2], 2, room_j, 2, locked=True)
    b, _, obj_color, _ = RG.add_object(b, L, keys[3], 2, room_j, kind=1)
    key_j = jax.random.randint(keys[4], (), 0, L.num_rows)
    b, _, _, _ = RG.add_object(b, L, keys[5], 0, key_j, kind=0, color=door_color)
    b = RG.place_agent(b, L, keys[6], 1, L.num_rows // 2)
    return b

g1 = jax.jit(lambda k: jax.vmap(gen_no_connect)(jax.random.split(k, B)))
s1 = g1(jax.random.PRNGKey(0)); jax.block_until_ready(s1.grid)
t0 = time.perf_counter()
for i in range(3):
    s1 = g1(jax.random.PRNGKey(i+1)); jax.block_until_ready(s1.grid)
print(f"gen WITHOUT connect_all: {(time.perf_counter()-t0)/3*1e3:.1f} ms/call")

# trip counts of the connect_all while loop across the batch
def connect_itr(key):
    b = gen_no_connect(key)
    k = jax.random.fold_in(key, 7)
    # replicate connect_all loop but return itr
    def cond(c):
        b, kk, itr = c
        return (~RG.reachable_rooms(b, L).all()) & (itr < 5000)
    import minigrid_tpu.core.roomgrid as R2
    # reuse internals via public connect_all on a copy: measure via while with itr
    # simplest: call connect_all-like loop inline
    from minigrid_tpu.core import constants as C
    from minigrid_tpu.core.grid import coord_grids
    # just count: run connect_all but carry itr by re-implementing cond/body through the module fn is complex;
    # instead: binary search max_itrs? cheap alternative: run with several max_itrs and check reachability
    return b

# cheaper: reachability success vs capped iterations
for cap in [8, 16, 32, 64, 128, 256]:
    def gen_cap(key, cap=cap):
        b = gen_no_connect(key)
        b = RG.connect_all(b, L, jax.random.fold_in(key, 7), max_itrs=cap)
        return RG.reachable_rooms(b, L).all()
    ok = jax.jit(lambda k: jax.vmap(gen_cap)(jax.random.split(k, B)))(jax.random.PRNGKey(0))
    print(f"cap {cap}: connected {float(ok.mean())*100:.2f}%")
