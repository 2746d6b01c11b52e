from meshopticalflow_tpu.io.ply import (
    read_ply,
    read_triangle_mesh,
    write_ply_colored,
    write_ply_face_vectors,
    write_ply_textured,
    write_ply_metric,
)
from meshopticalflow_tpu.io.png import read_png_rgb, write_png_rgb
from meshopticalflow_tpu.io.binio import read_vector, write_vector
