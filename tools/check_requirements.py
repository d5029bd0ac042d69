#!/usr/bin/env python3
"""Environment check (reference test_requirements.py counterpart): imports
each dependency group and reports pass/fail without hard-failing the run."""

import importlib
import sys

GROUPS = {
    "core": ["numpy", "jax", "jaxlib", "flax", "optax"],
    "eval": ["matplotlib", "scipy", "psutil"],
    "seeding (optional)": ["transformers", "sklearn"],
    "interop (optional)": ["torch"],
}


def main() -> int:
    failures = 0
    for group, modules in GROUPS.items():
        print(f"[{group}]")
        for name in modules:
            try:
                mod = importlib.import_module(name)
                version = getattr(mod, "__version__", "?")
                print(f"  OK   {name} {version}")
            except Exception as exc:
                optional = "optional" in group
                print(f"  {'WARN' if optional else 'FAIL'} {name}: {exc}")
                if not optional:
                    failures += 1
    try:
        import jax

        print(f"[devices] {[str(d) for d in jax.devices()]}")
    except Exception as exc:
        print(f"[devices] unavailable: {exc}")
        failures += 1
    print("PASS" if failures == 0 else f"FAIL ({failures} required deps missing)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
