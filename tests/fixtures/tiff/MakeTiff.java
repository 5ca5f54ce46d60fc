import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.BufferedImage;
import java.awt.image.WritableRaster;
import java.io.*;

public class MakeTiff {
    static BufferedImage pattern(int w, int h, boolean gray) {
        BufferedImage img = new BufferedImage(w, h,
            gray ? BufferedImage.TYPE_BYTE_GRAY : BufferedImage.TYPE_3BYTE_BGR);
        WritableRaster ras = img.getRaster();
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = (x * 255) / Math.max(1, w - 1);
                int g = (y * 255) / Math.max(1, h - 1);
                int b = ((x / 2 + y / 2) % 2 == 0) ? 220 : 30;
                if (gray) ras.setSample(x, y, 0, (r + g) / 2);
                else { ras.setSample(x,y,0,r); ras.setSample(x,y,1,g); ras.setSample(x,y,2,b); }
            }
        return img;
    }
    static void write(BufferedImage img, String path, String compression) throws Exception {
        ImageWriter w = ImageIO.getImageWritersByFormatName("tiff").next();
        ImageWriteParam p = w.getDefaultWriteParam();
        if (compression != null) {
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(compression);
        }
        try (ImageOutputStream ios = ImageIO.createImageOutputStream(new File(path))) {
            w.setOutput(ios);
            w.write(null, new IIOImage(img, null, null), p);
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
        ImageWriter w0 = ImageIO.getImageWritersByFormatName("tiff").next();
        for (String t : w0.getDefaultWriteParam().getCompressionTypes()) System.out.println("type: " + t);
        write(pattern(33, 21, false), d + "/rgb_none.tif", null);
        write(pattern(33, 21, false), d + "/rgb_lzw.tif", "LZW");
        write(pattern(40, 30, false), d + "/rgb_deflate.tif", "Deflate");
        write(pattern(24, 24, true),  d + "/gray_packbits.tif", "PackBits");
        dump(d + "/rgb_none.tif", d + "/rgb_none.rgb");
        dump(d + "/rgb_lzw.tif", d + "/rgb_lzw.rgb");
        dump(d + "/rgb_deflate.tif", d + "/rgb_deflate.rgb");
        dump(d + "/gray_packbits.tif", d + "/gray_packbits.rgb");
        System.out.println("ok");
    }
}
