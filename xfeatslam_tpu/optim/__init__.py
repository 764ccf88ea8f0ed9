"""Batched nonlinear optimization: pose-only LM, local/global BA, Sim3,
pose-graph, and RANSAC solvers — the TPU-native answer to g2o + the custom
solvers (/root/reference/src/Optimizer.cc, Sim3Solver.cc, MLPnPsolver.cpp,
TwoViewReconstruction.cc)."""
