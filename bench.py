"""Driver benchmark entry point: prints ONE JSON line (see
lora_tpu/benchmarks.py for the measurement)."""

from lora_tpu.benchmarks import main

if __name__ == "__main__":
    main()
