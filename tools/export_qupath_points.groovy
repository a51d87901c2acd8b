// QuPath annotation-point exporter (offline data prep).
//
// Our equivalent of the reference's GetPointNew.groovy workflow: dumps every
// point-annotation's centroid as an "x<TAB>y" row into
// <project>/points/<image>.tsv, the layout consumed by PointTestSource
// (cellsegmentation_tpu/data/masks.py). Run inside QuPath's script editor
// with a project image open.

import qupath.lib.gui.scripting.QPEx

def imageData = QPEx.getCurrentImageData()
def server = imageData.getServer()
def name = server.getMetadata().getName().replaceFirst(/\.[^.]+$/, "")

def outDir = buildFilePath(PROJECT_BASE_DIR, "points")
mkdirs(outDir)
def out = new File(buildFilePath(outDir, name + ".tsv"))

def lines = []
for (annotation in QPEx.getAnnotationObjects()) {
    def roi = annotation.getROI()
    if (roi == null) continue
    // point annotations contribute each point; area ROIs their centroid
    if (roi.isPoint()) {
        roi.getAllPoints().each { p ->
            lines << String.format("%d\t%d", Math.round(p.getX()), Math.round(p.getY()))
        }
    } else {
        lines << String.format("%d\t%d", Math.round(roi.getCentroidX()), Math.round(roi.getCentroidY()))
    }
}
out.text = lines.join("\n")
println "Wrote ${lines.size()} points to ${out}"
