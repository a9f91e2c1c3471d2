"""Core numerical ops: SO(3) toolbox, barrier functions, Riccati kernels."""
