from clinvar_pipeline_spark.cli import main

main()
