#!/bin/bash
# Reproduce every recorded benchmark (runs serially; the TPU is
# single-tenant). Results land in benchmarks/.
set -e
cd "$(dirname "$0")/.."

python bench.py | tee benchmarks/bench_headline.json

# CPU-torch baseline thread-scaling curve (run on the biggest host
# available; the artifact records nproc so partial curves are honest)
python scripts/baseline_scaling.py

python scripts/test_correlation.py --num-train 6000 --num-test 2000 \
    --output benchmarks/correlation_1rect_1circle.json
python scripts/test_correlation.py --env 3circle --num-train 6000 \
    --num-test 2000 --fit-target dist \
    --output benchmarks/correlation_3circle_dist.json

python scripts/speed_compare.py --envs 1rect_1circle 3circle \
    --methods adamdiffco aldiffco bidiffco gtdist \
    --num-train 6000 --num-problems 3 --trials 5 \
    --output benchmarks/speed_compare.json --no-resume

# Full 10-env x 9-method matrix (the reference's experiment design with
# pre-generated RRT-verified test configs; resumes per cell). Hours on
# one CPU core — the per-cell JSON resume is the point. CPU-forced so a
# concurrent TPU job is never blocked (host-loop methods dominate; the
# compiled methods are tunnel-insensitive at these sizes). se2_default /
# baxter_default are the SE(2) rigid-body and Baxter-vs-3D-scene env
# families (problems sampled inline; no staged configs needed there).
python scripts/run_cpu.py scripts/speed_compare.py \
    --envs 1rect 3circle 2class_1 1rect_1circle 2rect \
           3circle_7d:7 1rect_1circle_7d:7 7d_narrow:7 \
           se2_default baxter_default \
    --methods adamdiffco aldiffco bidiffco diffcogradfree givengrad \
              trustconstr gtgradfree gtdist rrtadamdiffco \
    --test-configs-dir benchmarks/test_configs \
    --output benchmarks/speed_compare_matrix.json

# trustconstr decision-variable study (options['free_waypoints'])
python scripts/run_cpu.py scripts/trustconstr_free_waypoints_study.py

python scripts/baxter_trajopt_benchmark.py --num-samples 8000 \
    --output benchmarks/baxter_trajopt.json

python scripts/trajopt_se2.py --num-samples 5000 \
    --output benchmarks/se2_trajopt.json
python scripts/trajopt_se3.py --num-samples 5000 \
    --output benchmarks/se3_trajopt.json

python scripts/temporal_1d.py
python scripts/escape_2d.py
python scripts/active_2d.py --timesteps 6 \
    --output benchmarks/active_2d.json
python scripts/line_query_eval.py --num-train 4000

python scripts/trajopt_2d.py --env 7d_narrow --dof 7 --link-length 1.0 \
    --num-samples 12000 --maxiter 300 --trials 10 --safety-margin -0.5 \
    --init rrt --output benchmarks/trajopt_7d_narrow.json

# narrow-passage representation study (FK workspace features /
# multi-class clusters vs the raw-config proxy on 7d_narrow)
python scripts/run_cpu.py scripts/narrow_fk_study.py

# AL strict-success plateau diagnosis + feasibility-restoration sweep
# (baxter_default; resumes per sweep key)
python scripts/baxter_al_budget_study.py

# torch-baseline thread-scaling curve (run on the biggest host available;
# records nproc so 1-core curves stay honest)
python scripts/baseline_scaling.py
