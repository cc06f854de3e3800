from mapreducewordcount_spark.cli import main

raise SystemExit(main())
