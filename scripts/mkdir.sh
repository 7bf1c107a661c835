#!/bin/bash
# Create the working directories the trainers expect
# (parity with /root/reference/mkdir.sh:1-14).
mkdir -p output/sphere output/given check_points model logs
echo "Created output/{sphere,given}, check_points, model, logs."
