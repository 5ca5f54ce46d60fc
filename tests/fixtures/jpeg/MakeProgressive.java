import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.BufferedImage;
import java.awt.image.WritableRaster;
import java.io.*;

public class MakeProgressive {
    static BufferedImage pattern(int w, int h, boolean gray) {
        BufferedImage img = new BufferedImage(w, h,
            gray ? BufferedImage.TYPE_BYTE_GRAY : BufferedImage.TYPE_3BYTE_BGR);
        WritableRaster ras = img.getRaster();
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = (x * 255) / Math.max(1, w - 1);
                int g = (y * 255) / Math.max(1, h - 1);
                int b = ((x + y) % 2 == 0) ? 200 : 40;
                if (gray) ras.setSample(x, y, 0, (r + g) / 2);
                else img.setRGB(x, y, (r<<16)|(g<<8)|b);
            }
        return img;
    }
    static void write(BufferedImage img, String path, float q) throws Exception {
        ImageWriter w = ImageIO.getImageWritersByFormatName("jpeg").next();
        ImageWriteParam p = w.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(q);
        p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        try (ImageOutputStream ios = ImageIO.createImageOutputStream(new FileOutputStream(path))) {
            w.setOutput(ios); w.write(null, new IIOImage(img, null, null), p);
        }
        w.dispose();
    }
    static void dump(String src, String outPath) throws Exception {
        BufferedImage img = ImageIO.read(new File(src));
        int w = img.getWidth(), h = img.getHeight();
        int nc = img.getRaster().getNumBands();
        try (DataOutputStream out = new DataOutputStream(new FileOutputStream(outPath))) {
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    for (int c = 0; c < nc; c++)
                        out.writeByte(img.getRaster().getSample(x, y, c));
        }
    }
    public static void main(String[] a) throws Exception {
        String d = a[0];
        write(pattern(45, 29, false), d + "/prog_rgb_q85.jpg", 0.85f);
        write(pattern(32, 32, true),  d + "/prog_gray_q90.jpg", 0.90f);
        dump(d + "/prog_rgb_q85.jpg", d + "/prog_rgb_q85.rgb");
        dump(d + "/prog_gray_q90.jpg", d + "/prog_gray_q90.rgb");
        System.out.println("ok");
    }
}
