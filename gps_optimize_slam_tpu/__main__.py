from gps_optimize_slam_tpu.cli import main

raise SystemExit(main())
