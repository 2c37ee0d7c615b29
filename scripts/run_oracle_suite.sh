#!/bin/bash
# Full oracle program for the VALIDATION.md LER root-cause (VERDICT item 1).
# Runs in the clean CPU env; logs to scripts/oracle_data/suite.log.
set -x
cd "$(dirname "$0")/.."
export QLDPC_TEST_REEXEC=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=1"
P=scripts/ler_oracle.py

# [[90]] p=0.004: the z=+3.0 anomaly point
python $P sample    --code "[[90, 8, 10]]" --cycles 10 --p 0.004 --n 4000 --seed 7
python $P ourdecode --code "[[90, 8, 10]]" --cycles 10 --p 0.004 --max-iter 20 --osd-order 2
python $P ourdecode --code "[[90, 8, 10]]" --cycles 10 --p 0.004 --max-iter 50 --osd-order 2
python $P refdecode --code "[[90, 8, 10]]" --cycles 10 --p 0.004 --n 40 --max-iter 20 --osd-order 2

# [[288]] p=0.005: ours 0.459 vs archive clusters 0.81 / 0.23
python $P sample    --code "[[288, 12, 18]]" --cycles 18 --p 0.005 --n 600 --seed 11
python $P ourdecode --code "[[288, 12, 18]]" --cycles 18 --p 0.005 --max-iter 20 --osd-order 2
python $P ourdecode --code "[[288, 12, 18]]" --cycles 18 --p 0.005 --max-iter 50 --osd-order 2
