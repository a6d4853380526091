"""The functional SLAM pipeline: frontend, mapping, backend BA, loop closing,
system facade.  Replaces the reference's thread/mutex object graph (L4/L5,
reference src/system.cpp, frontend.cpp, backend.cpp, loopclosing.cpp) with
pure jitted step functions over fixed-shape state pytrees."""
