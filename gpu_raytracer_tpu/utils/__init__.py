"""Host utilities: image IO, EXR, timing/profiling (reference: Src/Exporters/,
Src/Util/Timer, Src/Device/CUDAEvent profiling)."""
