"""Ablation on case 0004's logo-disc material: bump off / sss off."""
import sys, time
sys.path.insert(0,'/root/repo')
import rlshaders_tpu
import numpy as np, jax.numpy as jnp
from rlshaders_tpu.accel import trace as tracemod
from rlshaders_tpu.integrator import wavefront
from rlshaders_tpu.scene import build as buildmod
from rlshaders_tpu.io import exr
from rlshaders_tpu.utils.watermark import watermark_mask

scene = buildmod.build('/root/reference/testsuite/mtoa/0004/data/disney.ass')
accel = tracemod.build(scene.geometry)
ref = exr.read_rgb('/root/reference/testsuite/mtoa/0004/ref/ref.exr')
wm = watermark_mask('/root/reference/testsuite'); valid=~wm
mid = np.load('out/matid_0004.npy')
names = list(scene.material_names)
print('materials:', names, flush=True)
disc = mid==3
mats0 = scene.materials

def run(tag, mats):
    t0=time.time()
    scene_v = scene
    scene_v.materials = mats
    out = wavefront.render(scene_v, accel, seed=0, aa_samples=3, tile_pixels=8192)
    img = np.asarray(out['RGBA'],np.float32)
    d=(img-ref)
    print(f"{tag}: full {np.sqrt((d[valid]**2).mean()):.5f}  disc {np.sqrt((d[disc]**2).mean()):.5f}  discmean {d[disc].mean(0).round(4)}  {time.time()-t0:.0f}s", flush=True)
    np.save(f'out/ablate_{tag}.npy', img)

run('base', mats0)
bh = np.asarray(mats0.bump_height).copy(); bh[:]=0
run('nobump', mats0._replace(bump_height=jnp.asarray(bh)))
sw = np.asarray(mats0.sss_weight).copy(); sw[:]=0
run('nosss', mats0._replace(sss_weight=jnp.asarray(sw)))
