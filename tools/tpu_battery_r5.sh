#!/bin/bash
# Round-5 TPU measurement battery: every on-hardware evidence item from
# VERDICT r4 ("Next round" #1-#4), run sequentially (one TPU process at a
# time), each to its own log under /tmp/tpu_battery_r5/.
#
# Usage: bash tools/tpu_battery_r5.sh
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
OUT=/tmp/tpu_battery_r5
mkdir -p $OUT
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* (start $(date +%H:%M:%S))" | tee -a $OUT/battery.log
  timeout "$TMO" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name exit=$? (end $(date +%H:%M:%S))" | tee -a $OUT/battery.log
}

# 1. fused block-tail kernels vs unfused composition at trunk shapes
#    (VERDICT #1 "done =" evidence, kernel-level).
TMO=1200 run head_fused python tools/head_fused_probe.py

# 2. step-level MFU / roofline with the fused head in the loss trunk
#    (VERDICT #1 "done =" evidence, step-level: MFU > 20%?).
TMO=1800 run mfu python tools/mfu_probe.py 4

# 3. headline bench: synthetic + demo room views/s (targets: >14 synth,
#    demo/synth ratio <= 1.1 after the tent-formulation kernels).
TMO=5400 run bench python bench.py

# 4. remaining BASELINE.json configs on the real chip (VERDICT #4).
TMO=3600 run configs python tools/bench_configs.py

# 5. warm-cache full-preset end-to-end demo-room run -> wallclock.json
#    (VERDICT #2). Rebake the demo scene if /tmp was wiped (~3 min CPU).
if [ ! -d /tmp/demo_room/train ]; then
  TMO=1800 run make_demo python tools/make_demo_scene.py /tmp/demo_room 24
fi
TMO=5400 run e2e_warm python -m stylemesh_tpu.cli --preset scannet_full \
  --root_path /tmp/demo_room --scene scene0900_00 \
  --style_image_path /root/reference/styles/120styles/14-2.jpg \
  --batch_size 4 --bfloat16 --log_dir $OUT/demo_run
echo "battery done $(date)" | tee -a $OUT/battery.log
