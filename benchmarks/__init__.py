# Makes hardware probe scripts importable as ``benchmarks.*`` from the
# repo root (PYTHONPATH=/root/repo).
