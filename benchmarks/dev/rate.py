import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from bench import measure_rate
r = measure_rate(131072, n_steps=200, reps=5)
print(f"rate: {r/1e6:.2f} M particle-steps/s")
