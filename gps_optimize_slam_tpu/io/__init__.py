"""Host-side dataset I/O: TUM/KITTI trajectory files, KITTI oxts GNSS logs."""
