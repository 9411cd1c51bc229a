#!/usr/bin/env python
"""Run another script forced onto the CPU backend.

    python scripts/run_cpu.py scripts/speed_compare.py --envs ...

Needed because the ambient sitecustomize pins the remote TPU platform
(env vars alone don't override it) and the TPU is single-tenant: CPU-only
experiment sweeps must not claim it while a TPU job is in flight.
"""
import os
import runpy
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_platforms', 'cpu')

target = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(target, run_name='__main__')
