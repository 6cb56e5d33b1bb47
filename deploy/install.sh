#!/usr/bin/env bash
# tti edge installer — the ops layer the reference provides via auto_run.sh
# (SURVEY.md §2 "Deployment": apt deps, dialout group, venv, generated runner
# with git self-update + daily logs, systemd unit with Restart=on-failure).
# Re-designed: idempotent, no interactive prompts, explicit paths.
#
# Usage: sudo bash deploy/install.sh [install_dir] [service_user]
set -euo pipefail

INSTALL_DIR="${1:-/opt/tti}"
SERVICE_USER="${2:-${SUDO_USER:-$(whoami)}}"
REPO_URL="${TTI_REPO_URL:-}"
SERVICE_NAME="tti-inspection"

echo "== tti installer: dir=${INSTALL_DIR} user=${SERVICE_USER} =="

# --- system dependencies (camera + serial access) ---------------------------
if command -v apt-get >/dev/null 2>&1; then
    apt-get update -qq || true
    apt-get install -y -qq python3-venv python3-dev git v4l-utils || true
fi
# Serial port access for the stitch counter (reference: dialout group).
usermod -aG dialout "${SERVICE_USER}" 2>/dev/null || true
usermod -aG video "${SERVICE_USER}" 2>/dev/null || true

# --- code --------------------------------------------------------------------
mkdir -p "${INSTALL_DIR}"
if [ -n "${REPO_URL}" ]; then
    if [ -d "${INSTALL_DIR}/.git" ]; then
        git -C "${INSTALL_DIR}" fetch --quiet || true
    else
        git clone --quiet "${REPO_URL}" "${INSTALL_DIR}"
    fi
else
    # Local install: copy the repo this script lives in.
    SRC_DIR="$(cd "$(dirname "$0")/.." && pwd)"
    if [ "${SRC_DIR}" != "${INSTALL_DIR}" ]; then
        rsync -a --exclude .git --exclude saved_annotations "${SRC_DIR}/" "${INSTALL_DIR}/"
    fi
fi

# --- python environment --------------------------------------------------------
if [ ! -d "${INSTALL_DIR}/venv" ]; then
    python3 -m venv "${INSTALL_DIR}/venv"
fi
"${INSTALL_DIR}/venv/bin/pip" install --quiet --upgrade pip
if [ -f "${INSTALL_DIR}/requirements.txt" ]; then
    "${INSTALL_DIR}/venv/bin/pip" install --quiet -r "${INSTALL_DIR}/requirements.txt"
fi

# --- .env ---------------------------------------------------------------------
if [ ! -f "${INSTALL_DIR}/.env" ]; then
    cat > "${INSTALL_DIR}/.env" <<'ENVEOF'
# tti configuration — see tti/core/config.py for every key.
# DB_HOST=
# DB_USER=
# DB_PASSWORD=
# DB_DATABASE=
# DB_TABLE=
# MQTT_SERVER=
# SEAM_LENGTH_OFFSET=-1.3
# STITCH_WIDTH_OFFSET=-1.0
ENVEOF
    echo "wrote template ${INSTALL_DIR}/.env — fill in DB/MQTT credentials"
fi

# --- runner (self-update + daily logs; reference auto_runner.sh semantics) ----
cat > "${INSTALL_DIR}/run.sh" <<RUNEOF
#!/usr/bin/env bash
set -uo pipefail
cd "${INSTALL_DIR}"
LOG_DIR="${INSTALL_DIR}/logs"
mkdir -p "\${LOG_DIR}"
LOG_FILE="\${LOG_DIR}/tti_\$(date +%F).log"

# Self-update: fast-forward only; reinstall deps when requirements changed.
if [ -d .git ]; then
    BEFORE=\$(git rev-parse HEAD 2>/dev/null || echo none)
    git fetch --quiet 2>>"\${LOG_FILE}" || true
    git merge --ff-only @{u} --quiet 2>>"\${LOG_FILE}" || true
    AFTER=\$(git rev-parse HEAD 2>/dev/null || echo none)
    if [ "\${BEFORE}" != "\${AFTER}" ] && ! git diff --quiet "\${BEFORE}" "\${AFTER}" -- requirements.txt; then
        ./venv/bin/pip install --quiet -r requirements.txt 2>>"\${LOG_FILE}" || true
    fi
fi

exec ./venv/bin/python -m tti.cli run 2>&1 | tee -a "\${LOG_FILE}"
RUNEOF
chmod +x "${INSTALL_DIR}/run.sh"
chown -R "${SERVICE_USER}" "${INSTALL_DIR}"

# --- kiosk-host niceties (reference auto_run.sh §8 + §12) ---------------------
# Power button -> clean poweroff (operators have no keyboard on the line).
# Any systemd host qualifies: the block itself installs acpid and creates
# /etc/acpi (the old `a && b || c` condition short-circuited to a no-op on
# fresh images, which are exactly the hosts that need it).
if command -v systemctl >/dev/null 2>&1; then
    apt-get install -y -qq acpid 2>/dev/null || true
    mkdir -p /etc/acpi/events
    cat > /etc/acpi/events/powerbtn <<'ACPIEOF'
event=button/power
action=/usr/sbin/poweroff
ACPIEOF
    systemctl restart acpid 2>/dev/null || true
    systemctl enable acpid >/dev/null 2>&1 || true
fi
# Remote-desktop support tools need Xorg; disable Wayland when GDM is present.
if [ -f /etc/gdm3/custom.conf ]; then
    sed -i 's/^#WaylandEnable=false/WaylandEnable=false/' /etc/gdm3/custom.conf
    sed -i 's/^WaylandEnable=true/WaylandEnable=false/' /etc/gdm3/custom.conf
    echo "Wayland disabled in /etc/gdm3/custom.conf (reboot required)"
fi

# --- systemd unit (Restart=on-failure, RestartSec=5 like the reference) -------
cat > "/etc/systemd/system/${SERVICE_NAME}.service" <<UNITEOF
[Unit]
Description=tti stitch measurement system
After=network-online.target
Wants=network-online.target

[Service]
Type=simple
User=${SERVICE_USER}
WorkingDirectory=${INSTALL_DIR}
ExecStart=${INSTALL_DIR}/run.sh
Restart=on-failure
RestartSec=5
Environment=PYTHONUNBUFFERED=1

[Install]
WantedBy=multi-user.target
UNITEOF

systemctl daemon-reload
systemctl enable "${SERVICE_NAME}" >/dev/null 2>&1 || true
echo "== installed. start with: systemctl start ${SERVICE_NAME} =="
