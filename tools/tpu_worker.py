#!/usr/bin/env python
"""Persistent TPU job worker: holds the axon claim for the whole session and
executes python job files serially, so each job skips the multi-minute
per-process claim handshake.

Protocol: watch /tmp/tpu_jobs/ for NNN_name.py files; exec() each in a fresh
namespace (stdout/stderr tee'd to NNN_name.out; "DONE rc=0/1" sentinel line
last). Jobs run in-process — they can import tungsten_tpu and use jax
directly. Delete-on-pickup; results stay.
"""
import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
print("devices:", jax.devices(), flush=True)
import jax.numpy as jnp  # noqa: E402

print("warm:", float(jnp.arange(4.0).sum()), flush=True)
print("READY", flush=True)

while True:
    jobs = sorted(f for f in os.listdir(JOBS) if f.endswith(".py"))
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    path = os.path.join(JOBS, name)
    with open(path) as f:
        src = f.read()
    os.rename(path, path + ".picked")
    out_path = os.path.join(JOBS, name[:-3] + ".out")
    print(f"=== running {name}", flush=True)

    class Tee(io.TextIOBase):
        def __init__(self, *streams):
            self.streams = streams

        def write(self, s):
            for st in self.streams:
                st.write(s)
                st.flush()
            return len(s)

    with open(out_path, "w") as out:
        old_out, old_err = sys.stdout, sys.stderr
        sys.stdout = sys.stderr = Tee(out, old_out)
        rc = 0
        try:
            exec(compile(src, name, "exec"), {"__name__": "__tpu_job__"})
        except SystemExit as e:
            rc = int(e.code or 0)
        except Exception:
            traceback.print_exc()
            rc = 1
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        out.write(f"\nDONE rc={rc}\n")
    print(f"=== done {name} rc={rc}", flush=True)
