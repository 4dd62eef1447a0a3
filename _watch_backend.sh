#!/bin/bash
for i in $(seq 1 200); do
  if timeout 60 python -c "import jax; jax.config.update('jax_platform_name','cpu'); import jax.numpy as jnp; jnp.zeros(1)" 2>/dev/null; then
    echo "backend back at $(date)" > _backend_back.log
    python -m pytest tests/ -q > _pytest_postoutage.log 2>&1
    python bench.py > _bench_postoutage.log 2>&1
    echo "post-outage suite+bench done $(date)" >> _backend_back.log
    exit 0
  fi
  sleep 120
done
echo "backend never returned" > _backend_back.log
