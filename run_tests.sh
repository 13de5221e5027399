#!/bin/bash
# Run the test suite on CPU with 8 virtual devices (SURVEY.md §4.2).
# PALLAS_AXON_POOL_IPS= disables the axon TPU-tunnel registration that would
# otherwise contend for the single chip (one grant per process on this box).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
