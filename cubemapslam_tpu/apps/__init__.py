"""CLI drivers mirroring the reference example binaries
(Examples/cubemap_lafida.cpp, Examples/cubemap_fangshan.cpp)."""
