from dbt_fal_spark.cli import main

raise SystemExit(main())
