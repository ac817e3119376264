#!/bin/bash
# Round-5 end-of-round chip pipeline: validate the last code changes, warm
# every cache the driver's bench/graft checks will hit, and record the
# missing BASELINE configs. Run detached; each stage appends to the log.
set -x
cd /root/repo

# 1. Validate full-ON + invert semantics on the chip (compiles the FINAL
#    shared-scene program, which also warms bench_render's child).
python tools/probe_misrenorm.py --cases 0004 --passes 3 --variants base

# 2. Steady-state frame record (2-pass progressive: pass 2 = steady).
python -m rlshaders_tpu.cli render \
  /root/reference/testsuite/mtoa/0004/data/disney.ass \
  -o out/r5_steady_0004.exr --passes 2

# 3. Warm the glass-sphere 512 program (refract bench child, RR on).
python bench.py --refract-bench

# 4. BASELINE config #5: 4K-class skin close-up, timed, artifact kept.
python -m rlshaders_tpu.cli render scenes/skin_closeup.ass \
  -o out/skin_4k.exr --res 2880 --aa 2

# 5. TPU canary calibration (mid-res gate tier).
python tools/tpu_canary.py --calibrate --passes 4

# 6. Full bench rehearsal: must exit rc=0 with non-null extras.
timeout 2000 python bench.py; echo "BENCH RC=$?"
