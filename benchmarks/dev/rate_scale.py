import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from bench import measure_rate
for n, steps in [(131072, 500), (1048576, 200), (4194304, 50)]:
    r = measure_rate(n, n_steps=steps, reps=3)
    print(f"n={n:>8}: {r/1e6:8.2f} M particle-steps/s")
