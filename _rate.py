import sys
sys.argv = [sys.argv[0]]
from bench import measure_rate
r = measure_rate(131072, n_steps=200, reps=5)
print(f"rate: {r/1e6:.2f} M particle-steps/s")
