# Developer entry points.  The engine itself is pure Python/JAX; the only
# build artifact is the native MT19937 spawner.

PY ?= python

.PHONY: test bench native train eval clean

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

native: acas2d_tpu/native/libacas2d_native.so

acas2d_tpu/native/libacas2d_native.so: acas2d_tpu/native/mt_spawner.cc
	g++ -O2 -shared -fPIC -o $@ $<

train:
	$(PY) train.py --preset tpu

eval:
	$(PY) eval.py --params-npz artifacts/ppo_tpu_e_best.npz --episodes 100

clean:
	rm -rf runs/analysis /tmp/acas2d_*
