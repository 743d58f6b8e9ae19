"""Per-job durations AND inter-job driver gaps for declared queries (REST API, warm runs) - the r18 measurement harness: job time vs Catalyst/py4j planning time between jobs."""
import json, os, sys, time, urllib.request

sys.path.insert(0, "/root/repo")
sf_dir = "/root/testdata/sf0.1"
names = sys.argv[1:]

from w4h_etl_container_spark.session import get_spark
from w4h_etl_container_spark.plans.registry import load_library

spark = get_spark("profile-dur")
sc = spark.sparkContext
ui, app_id = sc.uiWebUrl, sc.applicationId
reg = load_library()


def job_count():
    return sc._jsc.sc().dagScheduler().nextJobId()


def jobs_after(j0):
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
    ) as r:
        data = json.load(r)
    out = [j for j in data if j["jobId"] >= j0]
    out.sort(key=lambda j: j["jobId"])
    return out


def run(name, d):
    reg[name].fn(spark, d).write.format("noop").mode("overwrite").save()


from datetime import datetime

def ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

for name in names:
    for d in ("/root/testdata/sf0.001", sf_dir):
        run(name, d)  # warm
    j0, t0 = job_count(), time.time()
    run(name, sf_dir)
    wall = time.time() - t0
    js = jobs_after(j0)
    tot = 0.0
    print(f"== {name}: {wall:.3f}s jobs={job_count()-j0}")
    prev_end = None
    for j in js:
        dur = ts(j["completionTime"]) - ts(j["submissionTime"])
        gap = ts(j["submissionTime"]) - prev_end if prev_end else 0.0
        prev_end = ts(j["completionTime"])
        tot += dur
        print(f"   job {j['jobId']}: {dur*1000:6.0f}ms gap={gap*1000:6.0f}ms stages={len(j.get('stageIds', []))} {j['name'][:80]}")
    print(f"   sum_job_time={tot:.3f}s wall={wall:.3f}s driver_gaps={wall-tot:.3f}s")
