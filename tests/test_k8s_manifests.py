"""Structural validation of deploy/k8s manifests (no kubectl in this
image; this is the `kubectl apply --dry-run=client`-shaped check): YAML
parses, required k8s fields exist, selectors match pod labels, services
target declared container ports, and the wiring (scheduler URL,
advertise-host, scaler endpoint) is internally consistent."""

import glob
import os

import yaml

K8S_DIR = os.path.join(os.path.dirname(__file__), "..", "deploy", "k8s")


def _docs():
    docs = []
    for path in sorted(glob.glob(os.path.join(K8S_DIR, "*.yaml"))):
        if path.endswith("kustomization.yaml"):
            continue
        with open(path) as f:
            for d in yaml.safe_load_all(f):
                if d:
                    docs.append((os.path.basename(path), d))
    return docs


def _by_kind(kind):
    return [d for _, d in _docs() if d.get("kind") == kind]


def test_manifests_parse_with_required_fields():
    docs = _docs()
    assert len(docs) >= 4
    for path, d in docs:
        assert d.get("apiVersion"), f"{path}: missing apiVersion"
        assert d.get("kind"), f"{path}: missing kind"
        assert d.get("metadata", {}).get("name"), f"{path}: missing name"


def test_selectors_match_pod_labels():
    for d in _by_kind("Deployment") + _by_kind("StatefulSet"):
        sel = d["spec"]["selector"]["matchLabels"]
        labels = d["spec"]["template"]["metadata"]["labels"]
        for k, v in sel.items():
            assert labels.get(k) == v, (d["metadata"]["name"], k)


def test_services_target_container_ports():
    pods = _by_kind("Deployment") + _by_kind("StatefulSet")
    port_names = {}
    for d in pods:
        comp = d["spec"]["template"]["metadata"]["labels"].get(
            "app.kubernetes.io/component")
        for c in d["spec"]["template"]["spec"]["containers"]:
            for p in c.get("ports", []):
                port_names.setdefault(comp, set()).add(p.get("name"))
                port_names[comp].add(p.get("containerPort"))
    for s in _by_kind("Service"):
        comp = s["spec"]["selector"].get("app.kubernetes.io/component")
        assert comp in port_names, s["metadata"]["name"]
        for p in s["spec"]["ports"]:
            tp = p.get("targetPort", p["port"])
            if s["spec"].get("clusterIP") == "None":
                continue  # headless: port list is informational
            assert tp in port_names[comp], (s["metadata"]["name"], tp)


def test_executor_wiring():
    (ss,) = _by_kind("StatefulSet")
    c = ss["spec"]["template"]["spec"]["containers"][0]
    args = " ".join(c.get("args", []) + c.get("command", []))
    # scheduler URL points at the scheduler service's rpc port
    (svc,) = [s for s in _by_kind("Service")
              if s["metadata"]["name"] == "ballista-scheduler"]
    rpc = [p for p in svc["spec"]["ports"] if p["name"] == "rpc"][0]["port"]
    assert f"http://ballista-scheduler:{rpc}" in args
    # advertise-host uses the headless service DNS for peer fetch
    assert "--advertise-host" in args and ".ballista-executor" in args
    assert "--work-dir" in args     # per-pod shuffle dir (p2p serving)
    # graceful drain window for the SIGTERM protocol
    assert ss["spec"]["template"]["spec"][
        "terminationGracePeriodSeconds"] >= 30


def test_scaler_targets_scheduler_api():
    (so,) = _by_kind("ScaledObject")
    assert so["spec"]["scaleTargetRef"]["name"] == "ballista-executor"
    trig = so["spec"]["triggers"][0]
    assert "/api/scaler/metrics" in trig["metadata"]["url"]
    assert "ballista-scheduler" in trig["metadata"]["url"]


def test_kustomization_lists_all_manifests():
    with open(os.path.join(K8S_DIR, "kustomization.yaml")) as f:
        k = yaml.safe_load(f)
    listed = set(k["resources"])
    on_disk = {os.path.basename(p)
               for p in glob.glob(os.path.join(K8S_DIR, "*.yaml"))}
    on_disk.discard("kustomization.yaml")
    assert listed == on_disk
