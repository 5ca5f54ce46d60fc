from filefilter_spark.cli import main

raise SystemExit(main())
