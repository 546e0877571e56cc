import os
import sys

from .cli import main

if __name__ == "__main__":
    rc = main()
    # hard exit: cold-start background compile threads (engine_tpu
    # warmups) may still be in flight on a remote backend, and the
    # tunneled plugin can abort (SIGABRT) during interpreter teardown
    # with remote work outstanding — all user-visible output and files
    # are complete by this point, so skip teardown entirely rather
    # than let a speculative warm thread corrupt the exit code
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc if isinstance(rc, int) else 0)
