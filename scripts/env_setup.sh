#!/usr/bin/env bash
# TPU-rebuild environment notes (reference scripts/env_setup.sh installed a
# CUDA/conda stack). This framework needs: jax (TPU), flax, optax,
# orbax-checkpoint, chex, numpy, pillow, pandas, scipy — all preinstalled in
# standard TPU images. Optional: torch (checkpoint conversion only), wandb,
# gradio. Native collate builds itself with g++ on first use.
pip install -e ".[convert,test]"
