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
names = list(scene.material_names)
print('materials:', names)
pi = [i for i,n in enumerate(names) if 'plinth' in n.lower()]
print('plinth idx:', pi)
pi = pi[0]
base_sr = float(np.asarray(scene.materials.spec_roughness)[pi])
print('plinth spec_roughness:', base_sr)
# blob region: plinth front face under the sphere (rows ~150-215, cols 70-190 at 256)
region = np.zeros((256,256),bool); region[150:215,70:190]=True; region &= valid
def run(tag):
    out = wavefront.render(scene, accel, seed=0, aa_samples=3, tile_pixels=8192)
    img = np.asarray(out['RGBA'],np.float32)
    d=(img-ref)
    print(f"{tag}: full {np.sqrt((d[valid]**2).mean()):.5f}  blob {np.sqrt((d[region]**2).mean()):.5f}", flush=True)
run(f'base sr={base_sr}')
for sr in (0.1, 0.1414, 0.2828, 0.4):
    m = np.asarray(scene.materials.spec_roughness).copy(); m[pi]=sr
    scene.materials = scene.materials._replace(spec_roughness=jnp.asarray(m))
    run(f'sr={sr}')
# also: Fresnel modes (Ksn semantics) probe: spec_ksn=0.5
m = np.asarray(scene.materials.spec_roughness).copy(); m[pi]=base_sr
scene.materials = scene.materials._replace(spec_roughness=jnp.asarray(m))
k = np.asarray(scene.materials.ks).copy(); k[pi]=0.6
scene.materials = scene.materials._replace(ks=jnp.asarray(k))
run('ks=0.6')
