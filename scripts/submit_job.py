"""spark-submit launcher: the archive from scripts/package.sh lands on sys.path
via --py-files, so the package imports absolutely.

    spark-submit --py-files dist/osm_data_3d_tiles_spark.zip \
        scripts/submit_job.py <command> [args...]
"""

import sys

from osm_data_3d_tiles_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
