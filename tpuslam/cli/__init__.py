"""Command-line entry points mirroring the reference app modes
(/root/reference/src/slam/src/core/main.cpp, Parameters.cpp)."""
